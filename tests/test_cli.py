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
