"""A11 CLI end-to-end: parse -> fit -> write artifacts."""

from __future__ import annotations

import json
import os


def test_cli_vw_fit_and_outputs(spark, tmp_path, capsys):
    from bigartm_spark.cli import main

    corpus = tmp_path / "c.vw"
    lines = []
    for d in range(30):
        toks = " ".join(f"tok{(d + j) % 9}:{j % 3 + 1}" for j in range(6))
        lines.append(f"doc{d} {toks}")
    corpus.write_text("\n".join(lines) + "\n")

    model_dir = str(tmp_path / "model")
    csv_dir = str(tmp_path / "model_csv")
    tracker = str(tmp_path / "tracker.json")
    rc = main(
        [
            "--read-vw-corpus", str(corpus),
            "-t", "3",
            "-p", "2",
            "--num-document-passes", "2",
            "--regularizer", "0.01 SmoothSparsePhi",
            "--save-model", model_dir,
            "--write-model-readable", csv_dir,
            "--score-tracker", tracker,
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "perplexity" in out
    assert json.loads(out.strip().splitlines()[-1])["status"] == "ok"
    assert os.path.exists(f"{model_dir}/meta.json")
    assert any(f.endswith(".csv") for f in os.listdir(csv_dir))
    hist = json.load(open(tracker))
    assert len(hist["perplexity"]) == 2


def test_cli_load_model_and_predict(spark, tmp_path):
    from bigartm_spark.cli import main

    corpus = tmp_path / "c2.vw"
    corpus.write_text(
        "\n".join(f"d{d} a:{d % 3 + 1} b c{(d % 4)}" for d in range(20)) + "\n"
    )
    model_dir = str(tmp_path / "m2")
    rc = main(
        ["--read-vw-corpus", str(corpus), "-t", "2", "-p", "1",
         "--save-model", model_dir]
    )
    assert rc == 0
    pred_dir = str(tmp_path / "preds")
    rc = main(
        ["--read-vw-corpus", str(corpus), "--load-model", model_dir,
         "--write-predictions", pred_dir]
    )
    assert rc == 0
    csvs = [f for f in os.listdir(pred_dir) if f.endswith(".csv")]
    assert csvs
    header = open(os.path.join(pred_dir, csvs[0])).readline().strip().split(",")
    assert header[0] == "doc_id" and len(header) == 3


def test_cli_modality_and_class_predictions(spark, tmp_path):
    """--use-modality weights + --predict-class/--write-class-predictions
    (srcmain.cc:279-280,427-429,1237-1276)."""
    from bigartm_spark.cli import main

    corpus = tmp_path / "c3.vw"
    lines = []
    for d in range(24):
        label = "pos" if d % 2 == 0 else "neg"
        toks = " ".join(f"w{(d + j) % 7}" for j in range(5))
        lines.append(f"doc{d} {toks} |@labels {label}")
    corpus.write_text("\n".join(lines) + "\n")
    pred_dir = str(tmp_path / "cls_preds")
    rc = main(
        [
            "--read-vw-corpus", str(corpus),
            "-t", "2", "-p", "2",
            "--use-modality", "@default_class,@labels:3",
            "--regularizer", "0.05 SparsePhi @@default_class",
            "--regularizer", "0.1 SmoothTheta",
            "--predict-class", "@labels",
            "--write-class-predictions", pred_dir,
        ]
    )
    assert rc == 0
    import os

    csvs = [f for f in os.listdir(pred_dir) if f.endswith(".csv")]
    assert csvs
    body = open(os.path.join(pred_dir, csvs[0])).read().strip().splitlines()
    assert body[0].split(",")[:2] == ["doc_id", "predicted"]
    preds = {line.split(",")[1] for line in body[1:]}
    assert preds <= {"pos", "neg"} and len(body) == 25


def test_cli_class_predictions_requires_predict_class(tmp_path):
    import pytest

    from bigartm_spark.cli import main

    with pytest.raises(SystemExit):
        main(["--read-vw-corpus", "x.vw", "--write-class-predictions", "p/"])


def test_parse_regularizer_grammar():
    """Reference spec grammar: tau name [#topics] [@classes] [?dict]."""
    import numpy as np

    from bigartm_spark.cli import parse_key_value_pairs, parse_regularizers

    topics = [f"topic_{i}" for i in range(4)]
    phi, theta = parse_regularizers(
        [
            "0.5 SparsePhi #0:2 @@default_class ?d",
            "2 Decorrelation",
            "0.3 SparseTheta #topic_0",
            "0.1 TopicSelection",
            "0.2 SmoothSparsePhi 0.4",  # legacy gamma form
        ],
        topics,
    )
    assert len(phi) == 3 and len(theta) == 2
    assert phi[0].tau == -0.5  # Sparse* negates
    assert phi[0].topic_names == ["topic_0", "topic_1"]
    assert phi[0].class_ids == ["@default_class"]
    assert phi[0].use_dictionary
    assert phi[1].tau == 2.0
    assert phi[2].gamma == 0.4
    assert theta[0].tau == -0.3
    np.testing.assert_allclose(theta[0].topic_mask, [1, 0, 0, 0])
    assert parse_key_value_pairs("@a,@b:5") == {"@a": 1.0, "@b": 5.0}


def test_cli_cooc_gathering(spark, tmp_path):
    """--cooc-window/--write-cooc-tf/--write-cooc-df (srcmain.cc:261-309)."""
    import os

    from bigartm_spark.cli import main

    corpus = tmp_path / "c4.vw"
    corpus.write_text(
        "\n".join(f"d{d} w{d % 3} w{(d + 1) % 3} w2" for d in range(15)) + "\n"
    )
    tf_dir = str(tmp_path / "cooc_tf")
    df_dir = str(tmp_path / "cooc_df")
    rc = main(
        [
            "--read-vw-corpus", str(corpus), "-t", "2", "-p", "1",
            "--cooc-window", "2", "--cooc-min-tf", "1",
            "--write-cooc-tf", tf_dir, "--write-cooc-df", df_dir,
        ]
    )
    assert rc == 0
    for d, cols in [(tf_dir, "token_a,token_b,cooc_tf,ppmi"),
                    (df_dir, "token_a,token_b,cooc_df")]:
        csvs = [f for f in os.listdir(d) if f.endswith(".csv")]
        assert csvs
        header = open(os.path.join(d, csvs[0])).readline().strip()
        assert header == cols


def test_cli_read_cooc_regularizer(spark, tmp_path):
    """--read-cooc feeds ImproveCoherence/Biterms regularizer specs."""
    from bigartm_spark.cli import main

    corpus = tmp_path / "c5.vw"
    corpus.write_text(
        "\n".join(f"d{d} a b c{(d % 2)}" for d in range(12)) + "\n"
    )
    cooc = tmp_path / "cooc.txt"
    cooc.write_text("a b:4\nb c0:2 c1:1\n")
    rc = main(
        [
            "--read-vw-corpus", str(corpus), "-t", "2", "-p", "2",
            "--read-cooc", str(cooc),
            "--regularizer", "0.1 ImproveCoherence",
        ]
    )
    assert rc == 0

    import pytest

    with pytest.raises(SystemExit):
        main(
            ["--read-vw-corpus", str(corpus), "-t", "2", "-p", "1",
             "--regularizer", "0.1 Biterms"]
        )


def test_cli_long_tail_flags(spark, tmp_path):
    """--batch-size / --guid-batch-name / --save-dictionary (.dict) /
    --use-dictionary / --dictionary-size / --csv-separator
    (srcmain.cc:1777,1789,1790,1825,1833,1843)."""
    import os

    from bigartm_spark.cli import main

    corpus = tmp_path / "lt.vw"
    corpus.write_text(
        "\n".join(f"d{d} alpha beta gamma w{d % 7}" for d in range(20)) + "\n"
    )
    batches = str(tmp_path / "batches")
    dict_file = str(tmp_path / "lt.dict")
    readable = str(tmp_path / "readable")
    rc = main(
        [
            "--read-vw-corpus", str(corpus), "-t", "2", "-p", "1",
            "--batch-size", "5", "--guid-batch-name",
            "--save-batches", batches,
            "--save-dictionary", dict_file,
            "--dictionary-size", "8",
            "--write-dictionary-readable", readable,
            "--csv-separator", "TAB",
            "--rand-seed", "3",
        ]
    )
    assert rc == 0
    # 20 docs / batch-size 5 -> 4-5 batches (doc ids are 1-based),
    # GUID-named partition dirs
    parts = [
        p for p in os.listdir(batches) if p.startswith("batch_id=")
    ]
    assert len(parts) in (4, 5)
    assert all(len(p.split("=", 1)[1]) == 36 for p in parts)
    # binary .dict round-trips and is size-capped
    from bigartm_spark.sources.io import import_dictionary

    d = import_dictionary(spark, dict_file)
    assert d.count() == 8
    # TAB separator reached the readable sink
    csvs = [f for f in os.listdir(readable) if f.endswith(".csv")]
    header = open(os.path.join(readable, csvs[0])).readline()
    assert "\t" in header
    # --use-dictionary consumes the .dict and skips gathering
    rc2 = main(
        [
            "--read-vw-corpus", str(corpus), "-t", "2", "-p", "1",
            "--use-dictionary", dict_file,
        ]
    )
    assert rc2 == 0


def test_cli_online_flags(spark, tmp_path, capsys):
    """--update-every/--tau0/--kappa run the online algorithm;
    --asynchronous the overlapped variant (srcmain.cc:1808-1815)."""
    from bigartm_spark.cli import main

    corpus = tmp_path / "on.vw"
    corpus.write_text(
        "\n".join(f"d{d} tok{d % 5} tok{(d + 1) % 5} common" for d in range(24))
        + "\n"
    )
    rc = main(
        [
            "--read-vw-corpus", str(corpus), "-t", "2",
            "--batch-size", "4", "--update-every", "2",
            "--tau0", "64", "--kappa", "0.6",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "perplexity" in out
    rc2 = main(
        [
            "--read-vw-corpus", str(corpus), "-t", "2",
            "--batch-size", "4", "--update-every", "2", "--asynchronous",
        ]
    )
    assert rc2 == 0


def test_pipeline_cli_end_to_end(tmp_path):
    """`python -m bigartm_spark pipeline`: dedup -> quality/lang filter ->
    split -> pack -> partitioned parquet + one JSON stats line."""
    import json
    import subprocess
    import sys

    out_dir = tmp_path / "clean"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "bigartm_spark",
            "pipeline",
            "--input",
            "/root/testdata/sf0.001/documents.parquet",
            "--output",
            str(out_dir),
            "--dedup",
            "exact",
            "--min-quality",
            "0.3",
            "--lang",
            "en",
            "--split",
            "train=0.8,val=0.1,test=0.1",
            "--pack-budget",
            "256",
            "--pack-shards",
            "4",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["input_rows"] == 500
    assert 0 < stats["after_dedup"] <= 500
    assert 0 < stats["after_quality"] <= stats["after_dedup"]
    assert stats["output_rows"] == stats["after_quality"]
    assert set(stats["splits"]) <= {"train", "val", "test"}
    # split is the partition key; packing columns landed
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(str(out_dir / "split=*/*.parquet"))
    assert files
    cols = set(pq.read_schema(files[0]).names)
    assert {"doc_id", "pack_id", "start_offset", "crosses_boundary"} <= cols


def test_pipeline_cli_semantic_dedup_and_doc_ppl(tmp_path):
    """--semantic-dedup (SemDeDup over the embeddings table) and
    --max-doc-ppl (model-based per-doc quality) as pipeline stages:
    both must drop rows and compose with the rest of the pipeline."""
    import json
    import subprocess
    import sys

    out_dir = tmp_path / "clean_sem"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "bigartm_spark",
            "pipeline",
            "--input",
            "/root/testdata/sf0.001/documents.parquet",
            "--output",
            str(out_dir),
            "--dedup",
            "exact",
            "--semantic-dedup",
            "--embeddings",
            "/root/testdata/sf0.001/embeddings.parquet",
            "--sem-threshold",
            "0.8",
            "--max-doc-ppl",
            "100000",
            "--doc-ppl-topics",
            "4",
            "--doc-ppl-passes",
            "1",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["input_rows"] == 500
    assert 0 < stats["after_semantic_dedup"] <= stats["after_dedup"]
    assert 0 < stats["after_doc_ppl"] <= stats["after_semantic_dedup"]
    assert stats["output_rows"] == stats["after_doc_ppl"]
    # --semantic-dedup without --embeddings is a usage error, not a crash
    r2 = subprocess.run(
        [
            sys.executable,
            "-m",
            "bigartm_spark",
            "pipeline",
            "--input",
            "/root/testdata/sf0.001/documents.parquet",
            "--output",
            str(tmp_path / "x"),
            "--semantic-dedup",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert r2.returncode == 2
    assert "--embeddings" in r2.stderr


def test_cli_sparse_init_flags(tmp_path, spark):
    """--dense-init-rate/--guaranteed-zeros-rate reach initialize_phi:
    a sparse-initialized model carries exact zeros in the tail tokens'
    rows, a dense one does not."""
    import subprocess
    import sys

    corpus = tmp_path / "sparse_init.vw"
    # 30-token vocab with a steep tf gradient so the dense-share ranking
    # has a clear head (high tf) and tail (low tf)
    lines = []
    for d in range(40):
        toks = [f"tok{k}" for k in range(30) if d % (k + 1) == 0]
        lines.append(f"doc{d} " + " ".join(toks))
    corpus.write_text("\n".join(lines) + "\n")

    out_dense = tmp_path / "m_dense"
    out_sparse = tmp_path / "m_sparse"
    base = [
        sys.executable,
        "-m",
        "bigartm_spark",
        "--read-vw-corpus",
        str(corpus),
        "-t",
        "4",
        "-p",
        "1",
        "--num-document-passes",
        "1",
    ]
    for extra, out in (
        ([], out_dense),
        (["--dense-init-rate", "0.25", "--guaranteed-zeros-rate", "0.9"], out_sparse),
    ):
        r = subprocess.run(
            base + extra + ["--save-model", str(out)],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=420,
        )
        assert r.returncode == 0, r.stderr[-2000:]

    from bigartm_spark.sources.io import import_model

    dense = import_model(spark, str(out_dense)).to_long()
    sparse = import_model(spark, str(out_sparse)).to_long()
    n_zero_dense = dense.filter("value = 0.0").count()
    n_zero_sparse = sparse.filter("value = 0.0").count()
    assert n_zero_sparse > n_zero_dense


def test_cli_scores_response_file_and_ppmi(spark, tmp_path, capsys):
    """--score / --final-score / --write-scores, --response-file splice,
    --disk-cache-folder, --write-ppmi-tf/df, engine no-op warning."""
    from bigartm_spark.cli import main

    corpus = tmp_path / "c.vw"
    lines = []
    for d in range(30):
        toks = " ".join(f"tok{(d + j) % 9}:{j % 3 + 1}" for j in range(6))
        lines.append(f"doc{d} {toks}")
    corpus.write_text("\n".join(lines) + "\n")

    resp = tmp_path / "args.rsp"
    resp.write_text("-t 3 -p 2 --num-document-passes 2 --threads 8\n")
    scores_txt = str(tmp_path / "scores.txt")
    ppmi_tf = str(tmp_path / "ppmi_tf")
    ppmi_df = str(tmp_path / "ppmi_df")
    cache_dir = str(tmp_path / "theta_cache")
    rc = main(
        [
            "--read-vw-corpus", str(corpus),
            "--response-file", str(resp),
            "--score", "SparsityPhi",
            "--final-score", "TopTokens",
            "--final-score", "SparsityPhi",
            "--write-scores", scores_txt,
            "--write-ppmi-tf", ppmi_tf,
            "--write-ppmi-df", ppmi_df,
            "--disk-cache-folder", cache_dir,
        ]
    )
    assert rc == 0
    captured = capsys.readouterr()
    assert "TopTokens" in captured.out
    assert "SparsityPhi = " in captured.out
    assert "--threads accepted for parity" in captured.err
    body = open(scores_txt).read()
    assert "perplexity 0 " in body and "SparsityPhi 0 " in body
    # per-pass tracked score has one value per pass
    assert body.count("SparsityPhi ") == 2
    import os

    assert any(f.endswith(".csv") for f in os.listdir(ppmi_tf))
    assert any(f.endswith(".csv") for f in os.listdir(ppmi_df))
    assert os.path.isdir(cache_dir)  # theta state table written


def test_cli_score_level_auto_scores(spark, tmp_path, capsys):
    """Default --score-level 2 (srcmain.cc:1834, expansion :440-489):
    SparsityPhi tracked per pass, TopTokens printed after fit; explicit
    --score resets the level to 0."""
    from bigartm_spark.cli import main

    corpus = tmp_path / "c.vw"
    corpus.write_text(
        "\n".join(
            f"doc{d} " + " ".join(f"tok{(d + j) % 7}" for j in range(5))
            for d in range(20)
        )
        + "\n"
    )
    rc = main(
        ["--read-vw-corpus", str(corpus), "-t", "2", "-p", "2",
         "--num-document-passes", "1"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "TopTokens topic_0 #1:" in out

    rc = main(
        ["--read-vw-corpus", str(corpus), "-t", "2", "-p", "1",
         "--num-document-passes", "1", "--score", "SparsityPhi"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "TopTokens" not in out  # explicit --score => level 0


def test_cli_switch_noops_and_response_file_eq(spark, tmp_path, capsys):
    """Reference bool_switch flags parse bare (--force, --paused, ...)
    and --response-file=FILE splices like the two-token form."""
    from bigartm_spark.cli import main

    corpus = tmp_path / "c.vw"
    corpus.write_text(
        "\n".join(f"doc{d} a b c" for d in range(10)) + "\n"
    )
    resp = tmp_path / "a.rsp"
    resp.write_text("-t 2 -p 1 --num-document-passes 1\n")
    rc = main(
        [
            "--read-vw-corpus", str(corpus),
            f"--response-file={resp}",
            "--force", "--paused", "--disable-avx-opt",
            "--use-sparse-computation",
            "--score-level", "0",
        ]
    )
    assert rc == 0
    err = capsys.readouterr().err
    for flag in ("--force", "--paused", "--disable-avx-opt"):
        assert f"{flag} accepted for parity" in err


def test_pipeline_cli_stats_report(tmp_path):
    """--stats-report writes before/after corpus_stats token budgets."""
    import json
    import subprocess
    import sys

    out_dir = tmp_path / "clean"
    report = tmp_path / "report.json"
    r = subprocess.run(
        [
            sys.executable, "-m", "bigartm_spark", "pipeline",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(out_dir),
            "--dedup", "exact",
            "--split", "train=0.9,val=0.1",
            "--stats-report", str(report),
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["stats_report"] == str(report)
    rep = json.loads(report.read_text())
    before, after = rep["before"], rep["after"]
    assert before and after
    assert sum(g["n_docs"] for g in after) == stats["output_rows"]
    assert sum(g["n_docs"] for g in before) == stats["input_rows"]
    for g in before + after:
        assert g["total_tokens"] > 0 and len(g["token_percentiles"]) == 3
