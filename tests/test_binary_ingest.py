"""Media-directory ingest (reference §3.2 lifecycle): binaryFile scan →
decode/resize/features → quarantine → create-or-get snapshot append."""

import os

from crawleria_spark.plans.snapshot import SnapshotCatalog
from crawleria_spark.sources.binary import ingest_media_dir, read_media_dir


def _make_media_dir(tmp_path, n=6):
    d = tmp_path / "shots"
    d.mkdir()
    for i in range(n):
        (d / f"page_{i}.png").write_bytes(b"PNGBYTES" * (50 + i))
    (d / "notes.txt").write_text("not media")  # filtered by glob
    (d / "clip.mp4").write_bytes(b"MP4" * 100)  # filtered by *.png pattern
    return str(d)


def test_read_media_dir_glob(spark, tmp_path):
    d = _make_media_dir(tmp_path)
    rows = read_media_dir(spark, d, "*.png").collect()
    assert len(rows) == 6
    assert all(r["media_type"] == "image" for r in rows)
    assert {r["media_id"] for r in rows} == {f"page_{i}" for i in range(6)}
    # video picked up with a wider glob, typed correctly
    all_rows = read_media_dir(spark, d, "*.{png,mp4}").collect()
    types = {r["media_id"]: r["media_type"] for r in all_rows}
    assert types["clip"] == "video"


def test_ingest_create_then_append(spark, tmp_path):
    d = _make_media_dir(tmp_path)
    catalog = SnapshotCatalog(spark, str(tmp_path / "cat"))
    res1 = ingest_media_dir(spark, d, catalog, max_width=500, feature_dim=4)
    assert res1["indexed"] == 6 and res1["quarantined"] == 0
    tbl = catalog.read("media_index")
    assert tbl.count() == 6
    row = tbl.first()
    assert row["sha256"] and len(row["features"]) == 4
    # create-or-get: second ingest APPENDS to the same table
    (tmp_path / "again").mkdir()
    d2 = _make_media_dir(tmp_path / "again", n=2)
    res2 = ingest_media_dir(spark, d2, catalog, max_width=500, feature_dim=4)
    assert res2["indexed"] == 8  # 6 + 2


def test_ingest_is_deterministic(spark, tmp_path):
    d = _make_media_dir(tmp_path)
    c1 = SnapshotCatalog(spark, str(tmp_path / "c1"))
    c2 = SnapshotCatalog(spark, str(tmp_path / "c2"))
    ingest_media_dir(spark, d, c1, feature_dim=4)
    ingest_media_dir(spark, d, c2, feature_dim=4)
    a = sorted(map(tuple, c1.read("media_index").drop("source_path").collect()))
    b = sorted(map(tuple, c2.read("media_index").drop("source_path").collect()))
    assert a == b


def test_pattern_pushdown_in_plan(spark, tmp_path):
    """The glob must reach the file listing, not a post-scan filter."""
    d = _make_media_dir(tmp_path)
    df = read_media_dir(spark, d, "*.png")
    files = [r["source_path"] for r in df.select("source_path").collect()]
    assert all(f.endswith(".png") for f in files)
    assert not any("notes" in os.path.basename(f) for f in files)
