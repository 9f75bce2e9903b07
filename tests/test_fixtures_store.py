"""The warehouse fixture store protocol (sources/fixtures.py):
atomic rename publication, torn-dir recovery, concurrent-stager loss,
bounded retention with grace windows. Pure-filesystem tests — a stub
Spark carries only the warehouse-dir conf."""

import json
import os
import time
from types import SimpleNamespace

from bfr_clustering_using_pyspark_spark.sources.fixtures import (
    FIXTURE_STORE_MAX,
    ensure_fixture,
    fixture_dir,
    prune_store,
)


def _fake_spark(warehouse):
    return SimpleNamespace(conf=SimpleNamespace(get=lambda k: str(warehouse)))


def _src(tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    (sf / "t.parquet").write_text("data")
    return str(sf)


class TestEnsureFixture:
    def test_stage_once_then_hit(self, tmp_path):
        spark, sf = _fake_spark(tmp_path / "wh"), _src(tmp_path)
        calls = []

        def stage(d):
            calls.append(d)
            with open(os.path.join(d, "payload"), "w") as fh:
                fh.write("x")

        d1 = ensure_fixture(spark, "k", sf, "t.parquet", "p", stage)
        d2 = ensure_fixture(spark, "k", sf, "t.parquet", "p", stage)
        assert d1 == d2 and len(calls) == 1
        # staged into the TEMP dir, published at the digest dir
        assert calls[0] != d1 and calls[0].startswith(d1 + ".tmp-")
        assert os.path.exists(os.path.join(d1, "payload"))
        assert os.path.exists(os.path.join(d1, "_fixture_meta.json"))
        assert not os.path.exists(calls[0])  # temp dir cleaned up

    def test_concurrent_winner_is_served_loser_discarded(self, tmp_path):
        """If another process publishes while we stage, our rename
        loses and we serve the winner's complete copy untouched."""
        spark, sf = _fake_spark(tmp_path / "wh"), _src(tmp_path)
        d = fixture_dir(spark, "k", sf, "t.parquet", "p")

        def stage(tmp):
            # the "other process" publishes mid-stage
            os.makedirs(d)
            with open(os.path.join(d, "payload"), "w") as fh:
                fh.write("winner")
            with open(os.path.join(d, "_fixture_meta.json"), "w") as fh:
                json.dump({}, fh)
            with open(os.path.join(tmp, "payload"), "w") as fh:
                fh.write("loser")

        got = ensure_fixture(spark, "k", sf, "t.parquet", "p", stage)
        assert got == d
        with open(os.path.join(d, "payload")) as fh:
            assert fh.read() == "winner"
        assert not any(e.startswith(os.path.basename(d) + ".tmp-")
                       for e in os.listdir(os.path.dirname(d)))

    def test_torn_old_protocol_dir_is_replaced(self, tmp_path):
        """A digest dir with content but NO meta marker (crashed
        writer under the old in-place protocol) reads as a miss and
        is atomically replaced."""
        spark, sf = _fake_spark(tmp_path / "wh"), _src(tmp_path)
        d = fixture_dir(spark, "k", sf, "t.parquet", "p")
        os.makedirs(d)
        with open(os.path.join(d, "torn_partial"), "w") as fh:
            fh.write("junk")

        def stage(tmp):
            with open(os.path.join(tmp, "payload"), "w") as fh:
                fh.write("fresh")

        got = ensure_fixture(spark, "k", sf, "t.parquet", "p", stage)
        assert got == d
        assert os.path.exists(os.path.join(d, "payload"))
        assert not os.path.exists(os.path.join(d, "torn_partial"))
        assert os.path.exists(os.path.join(d, "_fixture_meta.json"))


class TestPruneStore:
    def test_bounded_dirs_grace_and_stray_files(self, tmp_path):
        store = tmp_path / "kind"
        store.mkdir()
        old = time.time() - 7200
        for i in range(FIXTURE_STORE_MAX + 3):
            d = store / f"digest{i:02d}"
            d.mkdir()
            meta = d / "_fixture_meta.json"
            meta.write_text("{}")
            os.utime(meta, (old + i, old + i))
        # ancient torn dir: prunes first; fresh torn dir: spared
        (store / "stale_torn").mkdir()
        os.utime(store / "stale_torn", (1000, 1000))
        (store / "fresh_torn").mkdir()
        # fresh META'D dir: spared even beyond the bound (a reader
        # may be mid-scan)
        fresh = store / "aaa_fresh"
        fresh.mkdir()
        (fresh / "_fixture_meta.json").write_text("{}")
        # stray plain file: skipped entirely, occupies no slot
        (store / "stray.lock").write_text("")
        keep = store / f"digest{FIXTURE_STORE_MAX + 2:02d}"
        prune_store(str(store), keep=str(keep), meta_name="_fixture_meta.json")
        left = sorted(os.listdir(store))
        assert "stale_torn" not in left
        assert "fresh_torn" in left
        assert "aaa_fresh" in left
        assert "stray.lock" in left
        assert keep.name in left
        assert "digest00" not in left
        n_dirs = sum(os.path.isdir(store / e) for e in left)
        # the max_keep most-recent metas survive (aaa_fresh is one of
        # them), plus fresh_torn under grace; everything else over
        # the bound that was SAFE to prune is gone
        assert n_dirs == FIXTURE_STORE_MAX + 1
