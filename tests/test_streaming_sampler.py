"""Streaming data pipeline: bounded-memory bucketing over huge manifests,
per-process sharding, resumability, and multi-worker prefetch
(VERDICT round-1 Missing #5).
"""

import json
import os
import resource

import numpy as np

import conftest  # noqa: F401

from zipvoice_tpu.data.manifest import Cut, iter_manifest, mux_iter
from zipvoice_tpu.data.sampler import StreamingBucketingSampler


def _synthetic_cuts(n, seed=0):
    rng = np.random.RandomState(seed)
    for i in range(n):
        yield Cut(id=f"c{i}", text="hi", duration=float(rng.uniform(1, 20)))


def test_bounded_memory_over_large_stream():
    """Iterating a 300k-cut stream keeps RSS growth bounded (the old
    in-memory sampler would hold every cut + every batch)."""
    N = 300_000
    sampler = StreamingBucketingSampler(
        lambda ep: _synthetic_cuts(N), max_duration=100.0, num_buckets=20,
        shuffle=True, seed=1, shuffle_buffer=2000,
    )
    # warm-up epoch: allocator + boundary tables
    n0 = sum(1 for _ in sampler)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    sampler.set_epoch(1)
    n1 = 0
    total = 0
    for batch in sampler:
        n1 += 1
        total += len(batch)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert total == N
    assert n1 > 10_000  # ~300k cuts * ~10.5s / 100s-per-batch
    # peak RSS must not grow with a second full pass (constant memory)
    assert rss1 - rss0 < 50 * 1024, (rss0, rss1)  # <50MB growth (KB units)


def test_sharding_partitions_the_stream():
    N = 5000
    seen = []
    for rank in range(4):
        s = StreamingBucketingSampler(
            lambda ep: _synthetic_cuts(N), max_duration=50.0,
            shuffle=False, rank=rank, world_size=4,
        )
        ids = [c.id for batch in s for c in batch]
        assert len(ids) == N // 4
        seen.extend(ids)
    assert sorted(seen) == sorted(f"c{i}" for i in range(N))


def test_resume_skips_consumed_batches():
    N = 3000
    make = lambda: StreamingBucketingSampler(  # noqa: E731
        lambda ep: _synthetic_cuts(N), max_duration=60.0, shuffle=True,
        seed=7, shuffle_buffer=500,
    )
    s1 = make()
    all_batches = [[c.id for c in b] for b in s1]
    s2 = make()
    it = iter(s2)
    for _ in range(10):
        next(it)
    state = s2.state_dict()
    assert state["batch"] == 10
    s3 = make()
    s3.load_state_dict(state)
    resumed = [[c.id for c in b] for b in s3]
    assert resumed == all_batches[10:]


def test_batches_respect_duration_budget_and_buckets():
    N = 4000
    s = StreamingBucketingSampler(
        lambda ep: _synthetic_cuts(N), max_duration=80.0, num_buckets=10,
        shuffle=True, seed=3, drop_last=True,
    )
    for batch in s:
        total = sum(c.duration for c in batch)
        assert total <= 80.0 + 1e-6
        # duration homogeneity within a bucket batch: max/min ratio bounded
        ds = [c.duration for c in batch]
        if len(ds) > 1:
            assert max(ds) / min(ds) < 4.0, ds


def test_mux_iter_lazy_and_weighted(tmp_path):
    from zipvoice_tpu.data.manifest import write_manifest

    a = [Cut(id=f"a{i}", duration=2.0) for i in range(200)]
    b = [Cut(id=f"b{i}", duration=2.0) for i in range(100)]
    write_manifest(str(tmp_path / "a.jsonl"), a)
    write_manifest(str(tmp_path / "b.jsonl"), b)
    out = list(mux_iter(
        [lambda: iter_manifest(str(tmp_path / "a.jsonl")),
         lambda: iter_manifest(str(tmp_path / "b.jsonl"))],
        weights=[2.0, 1.0], seed=0,
    ))
    assert len(out) == 300
    assert {c.id for c in out} == {c.id for c in a + b}
    # both streams are interleaved, not concatenated
    first_hundred = [c.id[0] for c in out[:100]]
    assert "a" in first_hundred and "b" in first_hundred


def test_count_batches_matches_iteration():
    N = 2000
    s = StreamingBucketingSampler(
        lambda ep: _synthetic_cuts(N), max_duration=70.0, shuffle=True,
        seed=11,
    )
    n = s.count_batches()
    assert n == sum(1 for _ in s)


def test_multiworker_prefetch_order_and_content():
    from zipvoice_tpu.data.dataset import prefetch_batches

    batches = [[i, i + 1] for i in range(0, 40, 2)]

    class FakeDataset:
        def __call__(self, cuts):
            return {"ids": list(cuts)}

    got = [b["ids"] for b in prefetch_batches(
        iter(batches), FakeDataset(), num_prefetch=4, num_workers=4
    )]
    assert got == batches
