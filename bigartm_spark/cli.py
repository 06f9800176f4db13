"""A11: command-line interface — the `bigartm` CLI re-expressed.

Reference: /root/reference/src/bigartm/srcmain.cc (flag surface:
--read-vw-corpus/--read-uci-docword/--read-uci-vocab, -t/--topics,
-p/--passes, --num-document-passes, --regularizer, --dictionary-min-df /
--dictionary-max-df, --write-model-readable, --write-dictionary-readable,
--save-model/--load-model, --write-predictions).

    python -m bigartm_spark --read-vw-corpus corpus.vw -t 16 -p 10 \
        --regularizer "0.1 SmoothSparsePhi" --write-model-readable out/
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bigartm_spark", description="BigARTM-on-Spark CLI"
    )
    src = p.add_argument_group("input")
    src.add_argument("--read-vw-corpus", help="Vowpal Wabbit corpus file")
    src.add_argument("--read-uci-docword", help="UCI docword file")
    src.add_argument("--read-uci-vocab", help="UCI vocab file")
    src.add_argument("--use-batches", help="parquet batch store (A5)")
    src.add_argument(
        "--read-cooc",
        help="co-occurrence adjacency file (srcmain.cc --read-cooc); "
        "enables ImproveCoherence / Biterms regularizer specs",
    )
    src.add_argument(
        "--batch-size",
        type=int,
        default=500,
        help="items per batch when parsing raw corpora (srcmain.cc:1777)",
    )
    p.add_argument("-t", "--topics", type=int, default=16)
    p.add_argument("-p", "--passes", type=int, default=10)
    p.add_argument("--num-document-passes", type=int, default=10)
    p.add_argument(
        "--seed", "--rand-seed", dest="seed", type=int, default=0
    )
    p.add_argument(
        "--dense-init-rate",
        type=float,
        default=1.0,
        help="rate of tokens (sorted by tf) initialized without "
        "guaranteed zeros (srcmain.cc:1799)",
    )
    p.add_argument(
        "--guaranteed-zeros-rate",
        type=float,
        default=0.0,
        help="rate of guaranteed-zero cells for tokens outside the dense "
        "share (srcmain.cc:1800)",
    )
    p.add_argument(
        "--min-sparsity-rate",
        type=float,
        default=0.6,
        help="accepted for parity (srcmain.cc:1852); storage here is "
        "columnar parquet — sparse retrieval is get_phi_long(eps=...)",
    )
    p.add_argument("--dictionary-min-df", type=float, default=None)
    p.add_argument("--dictionary-max-df", type=float, default=None)
    p.add_argument(
        "--dictionary-size",
        type=int,
        default=None,
        help="keep only the N highest-df tokens (srcmain.cc:1789)",
    )
    p.add_argument(
        "--use-dictionary",
        default=None,
        help="dictionary to use instead of gathering: a reference binary "
        ".dict file or our parquet export dir (srcmain.cc:1790)",
    )
    online = p.add_argument_group("online learning (srcmain.cc:1808-1815)")
    online.add_argument(
        "--update-every",
        type=int,
        default=0,
        help="online EM: model update after every N documents (0 = offline)",
    )
    online.add_argument("--tau0", type=float, default=1024.0)
    online.add_argument("--kappa", type=float, default=0.7)
    online.add_argument(
        "--asynchronous",
        action="store_true",
        help="overlapped (stale-phi) online algorithm, G7",
    )
    online.add_argument(
        "--reuse-theta",
        action="store_true",
        help="reuse theta between iterations (C5)",
    )
    p.add_argument(
        "--use-modality",
        default=None,
        help='modalities to use with weights, "@default_class,@labels:5" '
        "(srcmain.cc parseKeyValuePairs; unlisted modalities are dropped)",
    )
    p.add_argument(
        "--regularizer",
        action="append",
        default=[],
        help='"tau Name [#topics] [@class_ids] [?dictionary]" — names per '
        "srcmain.cc:554-650: SmoothPhi, SparsePhi, SmoothTheta, "
        "SparseTheta, Decorrelation, TopicSelection, LabelRegularization "
        "(Sparse* negate tau); long names SmoothSparsePhi etc. also accepted",
    )
    p.add_argument(
        "--predict-class",
        default=None,
        help="class_id to predict with --write-class-predictions",
    )
    cooc = p.add_argument_group("cooc gathering (srcmain.cc:261-309)")
    cooc.add_argument("--cooc-window", type=int, default=5)
    cooc.add_argument("--cooc-min-tf", type=float, default=None)
    cooc.add_argument("--cooc-min-df", type=float, default=None)
    cooc.add_argument(
        "--write-cooc-tf", help="CSV sink: token_a,token_b,cooc_tf (+ppmi)"
    )
    cooc.add_argument(
        "--write-cooc-df", help="CSV sink: token_a,token_b,cooc_df"
    )
    out = p.add_argument_group("output")
    out.add_argument("--save-model", help="directory for phi parquet (A8)")
    out.add_argument("--load-model", help="skip fit, load phi (A8)")
    out.add_argument("--save-batches", help="write parsed corpus as parquet (A7)")
    out.add_argument("--write-model-readable", help="CSV pivot of phi (A11)")
    out.add_argument("--write-dictionary-readable", help="dictionary CSV")
    out.add_argument("--write-predictions", help="theta CSV for the corpus")
    out.add_argument(
        "--write-class-predictions",
        help="argmax-token CSV for --predict-class (srcmain.cc:1237-1276)",
    )
    out.add_argument("--write-vw-corpus", help="re-export corpus as VW")
    out.add_argument("--score-tracker", help="JSON path for score history (A10)")
    out.add_argument(
        "--save-dictionary",
        help="dictionary sink: a .dict path writes the reference binary "
        "format, anything else the parquet export dir (srcmain.cc:1825)",
    )
    out.add_argument(
        "--guid-batch-name",
        action="store_true",
        help="--save-batches names batches by GUID instead of sequential "
        "codes (srcmain.cc:1843; deterministic content-derived GUIDs here "
        "so retries are idempotent)",
    )
    out.add_argument(
        "--csv-separator",
        default=",",
        help="column separator for the readable CSV sinks "
        "(srcmain.cc:1833; \\t or TAB for tab)",
    )
    sc = p.add_argument_group("scores (srcmain.cc:652-760)")
    sc.add_argument(
        "--score-level",
        type=int,
        default=2,
        choices=(0, 1, 2, 3),
        help="auto-configure scores (srcmain.cc:440-489): >=1 tracks "
        "SparsityPhi per modality (perplexity/sparsity-theta always ride "
        "the E-step); >=2 prints TopTokens after fit; >=3 adds "
        "TopicKernel. Explicit --score/--final-score set it to 0",
    )
    sc.add_argument(
        "--score",
        action="append",
        default=[],
        help='"Name [@class_id]" tracked per pass: SparsityPhi, '
        "TopicMassPhi, BackgroundTokensRatio (Perplexity, SparsityTheta, "
        "ItemsProcessed always ride the E-step)",
    )
    sc.add_argument(
        "--final-score",
        action="append",
        default=[],
        help='"Name [@class_id]" computed once after fit and printed: '
        "the --score names plus TopTokens and TopicKernel",
    )
    sc.add_argument(
        "--write-scores",
        help="readable per-pass score history (one 'score pass value' "
        "line each)",
    )
    p.add_argument(
        "--disk-cache-folder",
        default=None,
        help="persist the theta cache as a parquet state table there "
        "(reference disk_cache_path, messages.proto:792)",
    )
    cooc2 = p.add_argument_group("cooc/ppmi sinks")
    cooc2.add_argument(
        "--store-symmetric-cooc",
        action="store_true",
        help="write each cooc pair once, canonicalized token_a < token_b "
        "(srcmain.cc:1788 bool switch); without it both (a,b) and (b,a) "
        "rows are written with equal counts, the reference's default "
        "storage",
    )
    cooc2.add_argument(
        "--write-ppmi-tf", help="CSV sink: token_a,token_b,ppmi (tf-based)"
    )
    cooc2.add_argument(
        "--write-ppmi-df", help="CSV sink: token_a,token_b,ppmi_df"
    )
    noop = p.add_argument_group(
        "accepted engine knobs (no Spark meaning; warned, never silently "
        "dropped)"
    )
    for flag, why in _NOOP_FLAGS.items():
        if flag in _NOOP_SWITCHES:
            # bool_switch in the reference (srcmain.cc:1832-1847): must
            # parse bare, with no value, or reference invocations break
            noop.add_argument(
                flag,
                action="store_const",
                const=True,
                default=None,
                help=f"no-op here: {why}",
            )
        else:
            noop.add_argument(flag, default=None, help=f"no-op here: {why}")
    p.add_argument(
        "--response-file",
        default=None,
        help="read additional whitespace-separated flags from a file "
        "(srcmain.cc response_file)",
    )
    return p


# engine/process knobs with no meaning on Spark — accepted so reference
# invocations run unchanged, warned so nobody thinks they took effect.
# Switches (boost bool_switch) take no value; the rest take one.
_NOOP_SWITCHES = {
    "--disable-avx-opt",
    "--use-sparse-computation",
    "--paused",
    "--force",
    "--profile",
}
_NOOP_FLAGS = {
    "--threads": "parallelism comes from the Spark master/executor conf",
    "--disable-avx-opt": "kernels are numpy/BLAS via Arrow",
    "--use-sparse-computation": "long-format plans skip zeros structurally",
    "--log-dir": "Spark log4j owns logging",
    "--log-level": "Spark log4j owns logging",
    "--profile": "use the Spark UI / event log",
    "--time-limit": "drive timeouts from the scheduler",
    "--paused": "no interactive console on a cluster driver",
    "--force": "sinks always overwrite (idempotent reruns)",
}


def parse_score_spec(spec: str):
    """'Name [@class_id]' -> (name, class_id | None)."""
    parts = spec.split()
    name, class_id = parts[0], None
    for elem in parts[1:]:
        if elem.startswith("@"):
            class_id = elem[1:]
        else:
            raise SystemExit(f"bad element {elem!r} in score {spec!r}")
    return name, class_id


def tracked_score_fn(name: str, class_id: str | None):
    """Scalar per-pass phi score for ARTM.phi_scores (I2/I8/I11)."""
    from pyspark.sql import functions as F

    from bigartm_spark.model import scores as S

    lname = name.lower()
    if lname == "sparsityphi":
        def fn(phi):
            df = S.sparsity_phi(phi, class_id=class_id)
            row = df.agg(
                F.sum("zero_count").alias("z"), F.sum("total_count").alias("t")
            ).collect()[0]
            return (row.z or 0) / row.t if row.t else 0.0

        return fn
    if lname == "topicmassphi":
        def fn(phi):
            # largest topic share — the scalar skew signal the full
            # per-topic relation collapses to
            df = S.topic_mass_phi(phi)
            return df.agg(F.max("topic_ratio")).collect()[0][0] or 0.0

        return fn
    if lname == "backgroundtokensratio":
        def fn(phi):
            df = S.background_tokens_ratio(phi)
            return df.agg(F.avg(F.col("is_background").cast("double"))).collect()[
                0
            ][0] or 0.0

        return fn
    raise SystemExit(
        f"unknown or non-scalar score {name!r} for --score "
        "(use --final-score for TopTokens / TopicKernel)"
    )


def parse_key_value_pairs(s: str) -> dict[str, float]:
    """srcmain.cc parseKeyValuePairs: "name[:weight],name2[:weight]",
    weight defaults to 1.0; separators comma or semicolon."""
    out: dict[str, float] = {}
    for part in s.replace(";", ",").split(","):
        part = part.strip()
        if not part:
            continue
        if ":" in part:
            name, w = part.rsplit(":", 1)
            out[name.strip()] = float(w)
        else:
            out[part] = 1.0
    return out


def _parse_topic_spec(spec: str, topics: list[str]) -> list[str]:
    """'#a,b,c' topic lists; 'i:j' integer ranges index into the model's
    topic names (srcmain.cc parseTopics)."""
    names: list[str] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if ":" in part:
            lo, hi = part.split(":", 1)
            names.extend(topics[int(lo) : int(hi)])
        elif part in topics:
            names.append(part)
        else:
            names.append(part)  # resolved against phi rows downstream
    return names


def parse_regularizers(specs: list[str], topics: list[str], cooc=None):
    """Inline regularizer grammar per srcmain.cc configureRegularizer:
    "tau Name [#topics] [@class_ids] [?dictionary]" (case-insensitive
    names, Sparse* negates tau). The legacy third-token float is still
    read as gamma for backwards compatibility."""
    import numpy as np

    from bigartm_spark.model import regularizers as R

    phi_regs, theta_agents = [], []
    for spec in specs:
        parts = spec.split()
        if len(parts) < 2:
            raise SystemExit(f"invalid regularizer: {spec!r}")
        tau, name = float(parts[0]), parts[1]
        lname = name.lower()
        gamma = None
        topic_names: list[str] | None = None
        class_ids: list[str] | None = None
        use_dictionary = False
        for elem in parts[2:]:
            if not elem:
                continue
            if elem[0] == "#":
                topic_names = _parse_topic_spec(elem[1:], topics)
            elif elem[0] == "@":
                class_ids = list(parse_key_value_pairs(elem[1:]))
            elif elem[0] == "?":
                use_dictionary = True
            else:
                try:
                    gamma = float(elem)  # legacy "tau Name gamma"
                except ValueError:
                    raise SystemExit(
                        f"bad element {elem!r} in regularizer {spec!r}"
                    )
        if lname in ("smoothphi", "sparsephi", "smoothsparsephi"):
            if lname == "sparsephi":
                tau = -tau
            r = R.SmoothSparsePhi(
                tau=tau,
                topic_names=topic_names,
                class_ids=class_ids,
                use_dictionary=use_dictionary,
            )
            r.gamma = gamma
            phi_regs.append(r)
        elif lname in ("decorrelation", "decorrelatorphi"):
            r = R.DecorrelatorPhi(tau=tau, topic_names=topic_names)
            r.gamma = gamma
            phi_regs.append(r)
        elif lname in ("labelregularization", "labelregularizationphi"):
            r = R.LabelRegularizationPhi(tau=tau, topic_names=topic_names)
            r.gamma = gamma
            phi_regs.append(r)
        elif lname in ("smooththeta", "sparsetheta", "smoothsparsetheta"):
            if lname == "sparsetheta":
                tau = -tau
            mask = None
            if topic_names is not None:
                sel = set(topic_names)
                mask = np.array(
                    [1.0 if t in sel else 0.0 for t in topics]
                )
            theta_agents.append(R.SmoothSparseTheta(tau=tau, topic_mask=mask))
        elif lname in ("topicselection", "topicselectiontheta"):
            theta_agents.append(R.TopicSelectionTheta(tau=tau))
        elif lname in ("improvecoherence", "improvecoherencephi"):
            if cooc is None:
                raise SystemExit(f"{name} requires --read-cooc")
            phi_regs.append(
                R.ImproveCoherencePhi(tau=tau, cooc=cooc, topic_names=topic_names)
            )
        elif lname in ("biterms", "bitermsphi"):
            if cooc is None:
                raise SystemExit(f"{name} requires --read-cooc")
            phi_regs.append(
                R.BitermsPhi(tau=tau, cooc=cooc, topic_names=topic_names)
            )
        else:
            raise SystemExit(f"unknown regularizer: {name}")
    return phi_regs, theta_agents


def _expand_response_file(argv: list[str]) -> list[str]:
    """srcmain.cc response_file: splice in whitespace-separated flags
    read from a file (before parsing, so they behave as typed)."""
    for i, tok in enumerate(argv):
        if tok == "--response-file":
            path, tail = argv[i + 1], argv[i + 2 :]
            break
        if tok.startswith("--response-file="):
            path, tail = tok.split("=", 1)[1], argv[i + 1 :]
            break
    else:
        return argv
    with open(path) as f:
        extra = f.read().split()
    return argv[:i] + extra + tail


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    args = build_parser().parse_args(_expand_response_file(argv))
    for flag in _NOOP_FLAGS:
        if getattr(args, flag.lstrip("-").replace("-", "_"), None) is not None:
            print(
                f"warning: {flag} accepted for parity but has no effect "
                f"({_NOOP_FLAGS[flag]})",
                file=sys.stderr,
            )
    if args.write_class_predictions and not args.predict_class:
        raise SystemExit(
            "--write-class-predictions requires --predict-class"
        )  # srcmain.cc:427-429
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import filter_dictionary, gather_dictionary
    from bigartm_spark.session import get_spark
    from bigartm_spark.sources import io as sio

    spark = get_spark("bigartm_spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    sep = "\t" if args.csv_separator in ("\\t", "TAB") else args.csv_separator

    from pyspark.sql import functions as F

    parsed_raw = False
    if args.read_vw_corpus:
        from bigartm_spark.sources.vw import read_vowpal_wabbit

        docs = read_vowpal_wabbit(spark, args.read_vw_corpus)
        parsed_raw = True
    elif args.read_uci_docword and args.read_uci_vocab:
        from bigartm_spark.sources.uci import read_uci

        docs = read_uci(spark, args.read_uci_docword, args.read_uci_vocab)
        parsed_raw = True
    elif args.use_batches:
        docs = sio.load_batches(spark, args.use_batches)
    else:
        raise SystemExit("no input: use --read-vw-corpus / --read-uci-* / --use-batches")
    if parsed_raw and args.batch_size:
        # srcmain.cc:1777 num_items_per_batch: rebatch the parsed corpus
        docs = docs.withColumn(
            "batch_id",
            F.floor(F.col("doc_id") / F.lit(args.batch_size)).cast("string"),
        )
    docs = docs.cache()

    if args.save_batches:
        out_docs = docs
        if args.guid_batch_name:
            # CollectionParserConfig_BatchNameType_Guid (srcmain.cc:1131);
            # content-derived (sha1 of the code) so retries are idempotent
            h = F.sha1(F.concat(F.lit("batch|"), F.col("batch_id")))
            out_docs = docs.withColumn(
                "batch_id",
                F.concat_ws(
                    "-",
                    F.substring(h, 1, 8),
                    F.substring(h, 9, 4),
                    F.substring(h, 13, 4),
                    F.substring(h, 17, 4),
                    F.substring(h, 21, 12),
                ),
            )
        sio.save_batches(out_docs, args.save_batches)

    if args.use_dictionary:
        dictionary = sio.import_dictionary(spark, args.use_dictionary)
    else:
        dictionary = gather_dictionary(docs)
    if args.dictionary_min_df is not None or args.dictionary_max_df is not None:
        dictionary = filter_dictionary(
            dictionary,
            min_df=args.dictionary_min_df,
            max_df=args.dictionary_max_df,
            recalculate_value=True,
        )
    if args.dictionary_size:
        from bigartm_spark.operators.dictionary import top_k_by_df

        dictionary = top_k_by_df(dictionary, args.dictionary_size)
    if args.save_dictionary:
        from bigartm_spark.operators.dictionary import num_items

        sio.export_dictionary(
            dictionary,
            args.save_dictionary,
            num_items_in_collection=num_items(docs),
        )
    if (
        args.write_cooc_tf
        or args.write_cooc_df
        or args.write_ppmi_tf
        or args.write_ppmi_df
    ):
        from bigartm_spark.operators.cooc import cooc_ppmi, ppmi

        cooc = cooc_ppmi(
            docs,
            window=args.cooc_window,
            min_tf=args.cooc_min_tf,
            min_df=args.cooc_min_df,
            symmetric=args.store_symmetric_cooc,
        )

        def _csv(df, path):
            df.coalesce(1).write.mode("overwrite").option(
                "header", True
            ).csv(path)

        if args.write_cooc_tf:
            _csv(
                cooc.select("token_a", "token_b", "cooc_tf", "ppmi"),
                args.write_cooc_tf,
            )
        if args.write_cooc_df:
            _csv(
                cooc.select("token_a", "token_b", "cooc_df"),
                args.write_cooc_df,
            )
        if args.write_ppmi_tf:
            # srcmain.cc --write-ppmi-tf: tf-mass PPMI, positive cells
            _csv(
                cooc.filter(F.col("ppmi") > 0).select(
                    "token_a", "token_b", "ppmi"
                ),
                args.write_ppmi_tf,
            )
        if args.write_ppmi_df:
            # df-mass PPMI (cooccurrence_collector.cc:745-790 keeps
            # separate tf/df pipelines): same ppmi over doc counts
            df_ppmi = ppmi(
                cooc.select(
                    "token_a",
                    "token_b",
                    F.col("cooc_df").alias("cooc_tf"),
                    "cooc_df",
                )
            )
            _csv(
                df_ppmi.filter(F.col("ppmi") > 0).select(
                    "token_a", "token_b", F.col("ppmi").alias("ppmi_df")
                ),
                args.write_ppmi_df,
            )
        from bigartm_spark.operators.cooc import release_cooc_caches

        release_cooc_caches()

    if args.write_dictionary_readable:
        dictionary.coalesce(1).write.mode("overwrite").option(
            "header", True
        ).option("sep", sep).csv(args.write_dictionary_readable)

    class_weights = (
        parse_key_value_pairs(args.use_modality) if args.use_modality else None
    )
    cooc_rel = None
    if args.read_cooc:
        from bigartm_spark.sources.cooc_file import read_cooc, to_cooc_relation

        cooc_rel = to_cooc_relation(read_cooc(spark, args.read_cooc)).cache()
    topic_names = [f"topic_{i}" for i in range(args.topics)]
    phi_regs, theta_agents = parse_regularizers(
        args.regularizer, topic_names, cooc=cooc_rel
    )
    if args.score or args.final_score:
        args.score_level = 0  # srcmain.cc:440-446: explicit scores win
    if args.score_level >= 1:
        args.score.append("SparsityPhi")
        for cls in class_weights or {}:
            args.score.append(f"SparsityPhi @{cls}")
    if args.score_level >= 2:
        args.final_score.append("TopTokens")
    if args.score_level >= 3:
        args.final_score.append("TopicKernel")
    phi_scores = {}
    for spec in args.score:
        name, cls = parse_score_spec(spec)
        key = name if cls is None else f"{name}@{cls}"
        phi_scores[key] = tracked_score_fn(name, cls)
    model = ARTM(
        topic_names=topic_names,
        num_document_passes=args.num_document_passes,
        seed=args.seed,
        class_weights=class_weights,
        phi_regularizers=phi_regs,
        theta_agents=theta_agents,
        reuse_theta=args.reuse_theta,
        phi_scores=phi_scores,
        theta_cache_path=args.disk_cache_folder,
    )
    if args.load_model:
        from bigartm_spark.sources.io import import_model

        model.dictionary = dictionary.cache()
        model.pwt = import_model(spark, args.load_model).cache()
        model.topics = model.pwt.topics
        model._broadcast_phi = True
    else:
        model.initialize(
            dictionary,
            dense_init_rate=args.dense_init_rate,
            guaranteed_zeros_rate=args.guaranteed_zeros_rate,
        )
        if args.update_every > 0:
            # srcmain.cc:1808-1815 online algorithm (G6/G7)
            from bigartm_spark.streaming.online import split_batch_groups

            groups = split_batch_groups(docs, args.update_every)
            fit = (
                model.fit_online_async
                if args.asynchronous
                else model.fit_online
            )
            fit(
                groups,
                tau0=args.tau0,
                kappa=args.kappa,
                update_every=args.update_every,
            )
        else:
            model.fit_offline(docs, num_collection_passes=args.passes)
        for i, ppl in enumerate(model.score_tracker.get("perplexity", [])):
            print(f"pass {i}: perplexity = {ppl:.4f}")

    for spec in args.final_score:
        name, cls = parse_score_spec(spec)
        lname = name.lower()
        if lname == "toptokens":
            from bigartm_spark.operators.topk import top_tokens

            rows = top_tokens(model.pwt.to_long(), k=10).collect()
            for r in sorted(rows, key=lambda r: (r.topic, r.rank)):
                print(f"{name} {r.topic} #{r.rank}: {r.token} {r.value:.6f}")
        elif lname == "topickernel":
            from bigartm_spark.model.scores import topic_kernel

            for r in sorted(
                topic_kernel(model.pwt).collect(), key=lambda r: r.topic
            ):
                print(
                    f"{name} {r.topic}: size={r.kernel_size} "
                    f"purity={r.purity:.4f} contrast={r.contrast:.4f}"
                )
        else:
            val = tracked_score_fn(name, cls)(model.pwt)
            print(f"{name} = {val:.6f}")
    if args.write_scores:
        import os as _os

        _os.makedirs(
            _os.path.dirname(args.write_scores) or ".", exist_ok=True
        )
        with open(args.write_scores, "w") as f:
            for score_name, vals in sorted(model.score_tracker.items()):
                for i, v in enumerate(vals):
                    f.write(f"{score_name} {i} {v}\n")
    if args.save_model:
        sio.export_model(model.pwt, args.save_model)
    if args.write_model_readable:
        sio.write_model_readable(model.pwt, args.write_model_readable, sep=sep)
    if args.write_predictions:
        theta = model.transform(docs)
        (
            theta.groupBy("doc_id")
            .pivot("topic", model.topics)
            .sum("value")
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .option("sep", sep)
            .csv(args.write_predictions)
        )
    if args.write_class_predictions:
        preds = model.predict_class_id(docs, args.predict_class)
        (
            preds.coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .option("sep", sep)
            .csv(args.write_class_predictions)
        )
    if args.write_vw_corpus:
        sio.write_corpus_vw(docs, args.write_vw_corpus)
    if args.score_tracker:
        sio.export_score_tracker(model.score_tracker, args.score_tracker)
    print(json.dumps({"status": "ok", "topics": len(model.topics)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
