"""zulia-tools CLI analogue: full index lifecycle through
`python -m zuliasearch_spark.tools` (Zulia.java / ZuliaAdmin.java /
ZuliaDump/Restore/Export/Import command surface), run in-process.
"""

from __future__ import annotations

import json
import os

import pytest

from zuliasearch_spark.config import FieldConfig, IndexAs, IndexConfig
from zuliasearch_spark.tools import main


@pytest.fixture(scope="module")
def home(tmp_path_factory):
    return str(tmp_path_factory.mktemp("zulia_home"))


@pytest.fixture(scope="module")
def settings_file(tmp_path_factory):
    cfg = IndexConfig(
        index_name="cli_idx",
        unique_id_col="uid",
        number_of_shards=2,
        default_search_fields=("title",),
        field_configs=(
            FieldConfig("title", index_as=(IndexAs("title", "whitespace_lc"),)),
            FieldConfig("kind", index_as=(IndexAs("kind", "lcKeyword"),), facet_as=("kind",)),
        ),
    )
    p = tmp_path_factory.mktemp("settings") / "settings.json"
    p.write_text(cfg.to_json())
    return str(p)


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "docs.jsonl"
    rows = [
        {"uid": f"d{i}", "title": f"alpha beta doc {i}", "kind": "even" if i % 2 == 0 else "odd", "rank": i}
        for i in range(20)
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def run(capsys, *argv) -> dict:
    assert main(list(argv)) == 0
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


@pytest.mark.slow
def test_cli_lifecycle(spark, home, settings_file, corpus_file, capsys):
    # createIndex + bulk index
    out = run(capsys, "--home", home, "createIndex", "--settings", settings_file)
    assert out["created"] == "cli_idx"
    out = run(capsys, "--home", home, "index", "--index", "cli_idx",
              "--input", corpus_file, "--format", "jsonl", "--segments", "2")
    assert out["segments"] == [0, 1]

    out = run(capsys, "--home", home, "displayIndexes")
    assert {"index": "cli_idx", "segments": 2} in out["indexes"]

    out = run(capsys, "--home", home, "docCount", "--index", "cli_idx")
    assert out["numDocs"] == 20

    out = run(capsys, "--home", home, "getFields", "--index", "cli_idx")
    assert "title" in out["fields"] and "kind" in out["fields"]

    # query: scored + facet + fetched docs
    out = run(capsys, "--home", home, "query", "--index", "cli_idx",
              "-q", "alpha", "--rows", "3", "--fetch", "FULL",
              "--facet", "kind")
    assert out["totalHits"] == 20
    assert len(out["results"]) == 3
    assert out["results"][0]["document"]["title"].startswith("alpha")
    fc = {f["label"]: f["count"] for f in out["facets"]["kind"]}
    assert fc == {"even": 10, "odd": 10}

    # filter + numeric stat + sort
    out = run(capsys, "--home", home, "query", "--index", "cli_idx",
              "--filter", "kind:even", "--stat", "rank")
    assert out["totalHits"] == 10
    assert out["numStats"]["rank"]["sum_v"] == sum(range(0, 20, 2))

    out = run(capsys, "--home", home, "query", "--index", "cli_idx",
              "--filter", "kind:odd", "--sort", "rank:desc", "--rows", "2")
    ranks = [r["rank"] for r in out["results"]]
    assert ranks == [19, 17]

    # store = upsert (replace d0's kind), then fetch it
    out = run(capsys, "--home", home, "store", "--index", "cli_idx",
              "--json", json.dumps({"uid": "d0", "title": "alpha beta doc 0", "kind": "flipped", "rank": 0}))
    assert out["segment"] == 2
    out = run(capsys, "--home", home, "fetch", "--index", "cli_idx", "--id", "d0")
    assert out["documents"][0]["kind"] == "flipped"
    out = run(capsys, "--home", home, "docCount", "--index", "cli_idx")
    assert out["numDocs"] == 20  # replaced, not added

    # delete + liveness
    run(capsys, "--home", home, "delete", "--index", "cli_idx", "--id", "d1")
    out = run(capsys, "--home", home, "docCount", "--index", "cli_idx")
    assert out["numDocs"] == 19
    out = run(capsys, "--home", home, "fetch", "--index", "cli_idx", "--id", "d1")
    assert out["documents"] == []

    # dump -> restore under a new name; counts carry over (deletes purged)
    dump_dir = os.path.join(home, "_dump")
    run(capsys, "--home", home, "dump", "--index", "cli_idx", "-o", dump_dir)
    out = run(capsys, "--home", home, "restore", "--index", "cli_restored",
              "--dir", dump_dir, "--segments", "1")
    assert out["restored"] == "cli_restored"
    out = run(capsys, "--home", home, "docCount", "--index", "cli_restored")
    assert out["numDocs"] == 19

    # export matching docs as JSONL
    exp_dir = os.path.join(home, "_export")
    run(capsys, "--home", home, "export", "--index", "cli_idx",
        "--filter", "kind:odd", "-o", exp_dir)
    exported = spark.read.json(exp_dir)
    assert exported.count() == 9  # d1 deleted

    # optimize: segments collapse to 1, counts unchanged
    out = run(capsys, "--home", home, "optimize", "--index", "cli_idx")
    out = run(capsys, "--home", home, "displayIndexes")
    assert {"index": "cli_idx", "segments": 1} in out["indexes"]
    out = run(capsys, "--home", home, "docCount", "--index", "cli_idx")
    assert out["numDocs"] == 19

    # reindex with current settings keeps every live doc searchable
    out = run(capsys, "--home", home, "reindex", "--index", "cli_idx")
    out = run(capsys, "--home", home, "query", "--index", "cli_idx", "-q", "alpha")
    assert out["totalHits"] == 19

    # clear + delete
    run(capsys, "--home", home, "clearIndex", "--index", "cli_restored")
    out = run(capsys, "--home", home, "displayIndexes")
    assert {"index": "cli_restored", "segments": 0} in out["indexes"]
    run(capsys, "--home", home, "deleteIndex", "--index", "cli_restored")
    out = run(capsys, "--home", home, "displayIndexes")
    assert all(ix["index"] != "cli_restored" for ix in out["indexes"])


@pytest.mark.slow
def test_cli_aliases_and_associated(spark, home, settings_file, corpus_file, capsys, tmp_path):
    # (depends on cli_idx built by the lifecycle test when run in
    # file order; rebuild defensively if it's gone)
    if not os.path.isdir(os.path.join(home, "cli_idx")):
        run(capsys, "--home", home, "createIndex", "--settings", settings_file)
        run(capsys, "--home", home, "index", "--index", "cli_idx",
            "--input", corpus_file, "--format", "jsonl", "--segments", "2")

    # alias chain resolves through query/docCount; cycles rejected
    run(capsys, "--home", home, "createAlias", "--alias", "latest", "--to", "cli_idx")
    run(capsys, "--home", home, "createAlias", "--alias", "prod", "--to", "latest")
    out = run(capsys, "--home", home, "displayAliases")
    assert out["aliases"] == {"latest": "cli_idx", "prod": "latest"}
    out = run(capsys, "--home", home, "docCount", "--index", "prod")
    assert out["numDocs"] >= 19
    with pytest.raises(SystemExit):
        run(capsys, "--home", home, "createAlias", "--alias", "cli_idx", "--to", "prod")
    run(capsys, "--home", home, "deleteAlias", "--alias", "prod")
    out = run(capsys, "--home", home, "displayAliases")
    assert "prod" not in out["aliases"]

    # associated files: store two, fetch one by name, fetch all
    f1 = tmp_path / "report.txt"
    f1.write_bytes(b"hello world")
    f2 = tmp_path / "data.bin"
    f2.write_bytes(bytes(range(16)))
    run(capsys, "--home", home, "storeAssociated", "--index", "cli_idx",
        "--id", "d2", "--file", str(f1), "--meta", '{"kind": "report"}')
    run(capsys, "--home", home, "storeAssociated", "--index", "cli_idx",
        "--id", "d2", "--file", str(f2))
    outdir = str(tmp_path / "fetched")
    out = run(capsys, "--home", home, "fetchAssociated", "--index", "cli_idx",
              "--id", "d2", "--name", "report.txt", "-o", outdir)
    assert out["fetched"] == ["report.txt"]
    assert open(os.path.join(outdir, "report.txt"), "rb").read() == b"hello world"
    out = run(capsys, "--home", home, "fetchAssociated", "--index", "cli_idx",
              "--id", "d2", "-o", outdir)
    assert sorted(out["fetched"]) == ["data.bin", "report.txt"]
    assert open(os.path.join(outdir, "data.bin"), "rb").read() == bytes(range(16))
