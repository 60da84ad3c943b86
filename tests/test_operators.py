"""Operator-family tests: streaming parity, multimodal plumbing,
simhash/IVF recall, dedup behavior on known clones."""

import pytest
from pyspark.sql import functions as F

from kgforge.operators.dedup import dd_exact, dd_minhash_lsh, dd_ngram_jaccard, dd_simhash
from kgforge.operators.multimodal import decode_image_stub, fake_meta, mm_extract_meta
from kgforge.operators.similarity import sim_topk_bruteforce, sim_topk_ivf
from kgforge.streaming import run_stream_parity


def test_stream_batch_parity(spark, sf001, tmp_path):
    """The same windowed-agg plan through readStream equals batch."""
    import shutil

    ev_dir = tmp_path / "events_stream"
    ev_dir.mkdir()
    shutil.copy(f"{sf001}/events.parquet", ev_dir / "events.parquet")
    stream_rows, batch_rows = run_stream_parity(spark, str(ev_dir))
    # batch path reads the original directory layout
    from kgforge.streaming import st_tumbling_agg

    batch_rows = st_tumbling_agg(spark, sf001).collect()
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    s = [(key(r), r["n_events"], r["sum_value"]) for r in stream_rows]
    b = [(key(r), r["n_events"], r["sum_value"]) for r in sorted(batch_rows, key=key)]
    assert s == b


def test_multimodal_stub_and_plumbing(spark):
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG")
    assert fake_meta(b"abc") == (3, 97, (97 + 98 + 99) % 997)
    assert fake_meta(None) is None
    df = spark.createDataFrame(
        [(1, b"abc"), (2, b""), (3, None)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in mm_extract_meta(df).collect()}
    assert rows[1]["byte_len"] == 3 and rows[1]["first_byte"] == 97
    assert rows[2]["byte_len"] == 0 and rows[2]["first_byte"] == 0
    assert rows[3]["byte_len"] is None


def test_multimodal_resize_and_embed_plumbing(spark):
    from kgforge.operators.multimodal import (
        EMBED_DIM,
        RESIZE_TARGET,
        fake_dims,
        mm_embed_batch,
        mm_resize_batch,
    )

    df = spark.createDataFrame(
        [(1, b"x" * 10), (2, b"y" * 5000), (3, None)],
        "doc_id long, payload binary",
    )
    rz = {r["doc_id"]: r for r in mm_resize_batch(df).collect()}
    for i, n in ((1, 10), (2, 5000), (3, 0)):
        w, h = fake_dims(n)
        assert (rz[i]["orig_w"], rz[i]["orig_h"]) == (w, h)
        assert max(rz[i]["out_w"], rz[i]["out_h"]) <= RESIZE_TARGET
        if max(w, h) <= RESIZE_TARGET:
            assert (rz[i]["out_w"], rz[i]["out_h"]) == (w, h)

    em = {r["doc_id"]: r["feat"] for r in mm_embed_batch(df).collect()}
    assert all(len(v) == EMBED_DIM for v in em.values())
    assert em[3] == [0.0] * EMBED_DIM  # None payload -> zero checksum vector


def test_simhash_finds_known_neardups(spark, sf01):
    """SimHash guarantees: exact clones collide at hamming 0, and the
    fixture's ' dup' near-duplicates are recalled at a useful rate
    (approximate op — recall-tested, not oracle-tested). The word-salad
    corpus is adversarial for simhash (30-word shared vocabulary), so
    the near-dup recall bar is deliberately modest; MinHash is the
    precise path (see test_minhash_equals_exact_baseline)."""
    exact = {(r["a"], r["b"]) for r in dd_ngram_jaccard(spark, sf01).collect()}
    sim_rows = dd_simhash(spark, sf01).collect()
    sim = {(r["a"], r["b"]) for r in sim_rows}
    assert exact, "fixture should contain near-dup pairs"
    recall = len(exact & sim) / len(exact)
    assert recall >= 0.6, f"simhash near-dup recall {recall:.2f}"


def test_simhash_exact_clones_hamming_zero(spark, sf01):
    """Planted exact clones must collide with hamming distance 0."""
    from kgforge.operators import dedup as D
    from kgforge.sources import read_table
    from pyspark.sql import functions as F2

    docs = D._docs_with_clones(spark, sf01)

    # run the simhash body over the cloned corpus by monkeypatching input
    import kgforge.sources as S

    orig = S.read_table
    try:
        S.read_table = lambda sp, name, sf: docs if name == "documents" else orig(sp, name, sf)
        D.read_table = S.read_table
        pairs = {
            (r["a"], r["b"]): r["hamming"] for r in D.dd_simhash(spark, sf01).collect()
        }
    finally:
        S.read_table = orig
        D.read_table = orig
    clone_pairs = [(i, i + 100000) for i in range(0, 500, 10)]
    found = [pairs.get(p) for p in clone_pairs]
    assert all(h == 0 for h in found), f"clone hammings: {found[:10]}"


def test_minhash_equals_exact_baseline(spark, sf01):
    exact = {(r["a"], r["b"]) for r in dd_ngram_jaccard(spark, sf01).collect()}
    mh = {(r["a"], r["b"]) for r in dd_minhash_lsh(spark, sf01).collect()}
    assert mh == exact


def test_exact_dedup_finds_planted_clones(spark, sf01):
    rows = dd_exact(spark, sf01).collect()
    assert all(r["n_copies"] == 2 for r in rows)
    assert all(r["keeper_doc_id"] % 10 == 0 for r in rows)


def test_fallback_source_degrades_to_empty(spark, sf01):
    """Optional input missing -> empty relation, not an exception (the
    loyalty-view fallback, Oracle/PCORNetLoader_ora.sql:166-177)."""
    from pyspark.sql import types as T
    from kgforge.sources import read_table_or_empty

    schema = T.StructType([T.StructField("x", T.LongType())])
    df = read_table_or_empty(spark, "no_such_table", sf01, schema)
    assert df.count() == 0
    assert df.schema == schema
    real = read_table_or_empty(spark, "nation", sf01, schema)
    assert real.count() == 25


def test_pyfiles_zip_importable(tmp_path):
    """The spark-submit --py-files artifact contains the whole package."""
    import subprocess, sys, zipfile
    from tools.package import build

    z = build(tmp_path / "kgforge.zip")
    names = zipfile.ZipFile(z).namelist()
    assert "kgforge/pipeline.py" in names and "kgforge/cli.py" in names
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import kgforge.canon, kgforge.emit, kgforge.cli; print('ok')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, str(z)], capture_output=True, text=True
    )
    assert r.stdout.strip() == "ok", r.stderr


def test_ivf_recall_vs_bruteforce(spark, sf01):
    bf = {
        (r["query_id"], r["cand_id"])
        for r in sim_topk_bruteforce(spark, sf01).collect()
    }
    ivf = {
        (r["query_id"], r["cand_id"]) for r in sim_topk_ivf(spark, sf01).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low for 4-cell probe"
