"""CLI veneer smoke tests (reference cli/main.py analog). get_spark
reuses the active test session, so these run in-process."""

from __future__ import annotations

import os
import tempfile

from data_pipeline2_spark import cli


def test_cli_status_and_search(spark, capsys):
    assert cli.main(["--data", "/root/testdata/sf0.001", "status", "7"]) == 0
    out = capsys.readouterr().out
    assert "doc_id" in out and "7" in out
    assert cli.main(["--data", "/root/testdata/sf0.001", "search", "0", "-k", "3"]) == 0
    out = capsys.readouterr().out
    assert "1.0" in out  # self-similarity


def test_cli_search_missing_vec(spark, capsys):
    assert cli.main(["--data", "/root/testdata/sf0.001", "search", "999999"]) == 1


def test_cli_ingest_and_chunk(spark, capsys):
    d = tempfile.mkdtemp(prefix="dp2s_cli_")
    with open(os.path.join(d, "x.md"), "wb") as f:
        f.write(b"# t\nbody")
    assert cli.main(["ingest", d]) == 0
    out = capsys.readouterr().out
    assert "text/markdown" in out
    assert cli.main(["--data", "/root/testdata/sf0.001", "chunk", "fixed", "--size", "100"]) == 0
    assert "total chunks" in capsys.readouterr().out


def test_cli_list_and_query(capsys):
    from data_pipeline2_spark.cli import main

    assert main(["list", "unpivot"]) == 0
    out = capsys.readouterr().out
    assert "unpivot_metrics" in out

    assert main(["--data", "/root/testdata/sf0.001", "query",
                 "unpivot_metrics", "-n", "5"]) == 0
    out = capsys.readouterr().out
    assert "rows: " in out


def test_cli_query_unknown_key_suggests(capsys):
    from data_pipeline2_spark.cli import main

    assert main(["query", "unpvt"]) == 1
    err = capsys.readouterr().err
    assert "unknown key" in err


def test_cli_sql(spark, capsys):
    from data_pipeline2_spark.cli import main

    rc = main([
        "--data", "/root/testdata/sf0.001",
        "sql", "SELECT count(*) AS n FROM documents",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "rows: 1" in out and "n" in out


def test_cli_dedupe_and_compact(spark, capsys, tmp_path):
    from data_pipeline2_spark.cli import main
    from data_pipeline2_spark.sources.parquet import load_table

    rc = main(["--data", "/root/testdata/sf0.001", "dedupe"])
    out = capsys.readouterr().out
    assert rc == 0 and "near-dup pairs" in out and "exact dup groups" in out

    frag = str(tmp_path / "frag")
    load_table(spark, "/root/testdata/sf0.001", "documents") \
        .repartition(20).write.parquet(frag)
    rc = main(["compact", frag, "--target-mb", "128"])
    out = capsys.readouterr().out
    assert rc == 0 and "compacted" in out
    import glob
    assert len(glob.glob(frag + "/*.parquet")) < 20


def test_cli_dedupe_empty_corpus_no_typeerror(spark, capsys, tmp_path):
    """ADVICE r4: with zero non-empty documents dup_doc_fraction is NULL
    (0/0); the report must coalesce it instead of raising TypeError."""
    from data_pipeline2_spark.cli import main

    data = str(tmp_path / "empty")
    spark.createDataFrame(
        [(1, None, "en", "s", 0), (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(data + "/documents.parquet")
    rc = main(["--data", data, "dedupe"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "0.0%" in out


def test_cli_report(spark, capsys):
    from data_pipeline2_spark.cli import main

    rc = main(["--data", "/root/testdata/sf0.001", "report"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "gopher" in out and "c4" in out and "quality" in out
