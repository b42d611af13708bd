"""Round-14 unit tests: staged-cache fingerprints (ADVICE r13),
prestage timing surface, and the probe's ARI implementation."""

from __future__ import annotations

import os
import shutil

import pytest

from dataengineeringproject_spark.registry import source_fingerprint


def test_source_fingerprint_changes_on_regeneration(tmp_path):
    """Regenerating a dataset at the SAME path must change the cache
    key (the ADVICE r13 stale-staged-parquet foot-gun)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    p = sf / "documents.parquet"
    p.write_bytes(b"one")
    k1 = source_fingerprint(str(sf), "documents")
    p.write_bytes(b"two!")  # different size
    k2 = source_fingerprint(str(sf), "documents")
    assert k1 != k2
    # same size, different mtime
    p.write_bytes(b"one")
    os.utime(p, ns=(1, 1))
    k3 = source_fingerprint(str(sf), "documents")
    os.utime(p, ns=(2, 2))
    k4 = source_fingerprint(str(sf), "documents")
    assert k3 != k4


def test_source_fingerprint_directory_layout(tmp_path):
    """Directory-style parquet datasets fingerprint their part files
    (ignoring _SUCCESS markers) and react to a changed part."""
    sf = tmp_path / "sf"
    d = sf / "events.parquet"
    d.mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"aaaa")
    (d / "_SUCCESS").write_bytes(b"")
    k1 = source_fingerprint(str(sf), "events")
    (d / "part-0.parquet").write_bytes(b"bbbbbb")
    k2 = source_fingerprint(str(sf), "events")
    assert k1 != k2
    shutil.rmtree(d)


def test_staged_caches_keyed_by_fingerprint():
    """The three r13 staged producers must key their in-process caches
    by content fingerprint, not bare sf_dir path (ADVICE r13)."""
    import inspect

    from dataengineeringproject_spark.queries import curation, llm_text

    for fn in (
        llm_text._staged_tokset,
        llm_text._staged_docg,
        curation._staged_fuz_keys,
    ):
        src = inspect.getsource(fn)
        assert "source_fingerprint" in src, fn.__name__


def test_prestage_returns_per_hook_timings(spark):
    """registry.prestage returns {hook_name: wall_sec} so bench
    artifacts can record staging cost (ADVICE r13)."""
    from dataengineeringproject_spark import registry

    t = registry.prestage(spark, "/root/testdata/sf0.001")
    assert t and all(
        isinstance(k, str) and isinstance(v, float) for k, v in t.items()
    )
    assert "_staged_tokset" in t


def test_ari_contingency():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from probe_scale100 import _ari_from_contingency

    # identical partitions -> 1.0
    assert _ari_from_contingency({(1, 1): 50, (2, 2): 50}) == pytest.approx(1.0)
    # one point moved between two size-50 clusters -> high but < 1
    near = _ari_from_contingency({(1, 1): 49, (1, 2): 1, (2, 2): 50})
    assert 0.9 < near < 1.0
    # everything merged on one side vs split on the other -> 0.0
    assert _ari_from_contingency({(1, 1): 50, (1, 2): 50}) == pytest.approx(
        0.0, abs=1e-9
    )
