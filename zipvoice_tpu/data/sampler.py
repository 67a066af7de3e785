"""Duration-bucketed batch sampler with resumable state.

Replaces lhotse's DynamicBucketingSampler (reference
zipvoice/dataset/datamodule.py:177-195: max_duration seconds per batch,
30 buckets, shuffled) with a TPU-twist: within a bucket, all utterances
compile to the same padded frame length, so batches hit a small set of
static shapes.

State (epoch, batch index, rng seed) is a plain dict -> checkpointable, so
training resumes mid-epoch (the reference saves sampler state dicts,
checkpoint.py:90-93).
"""

import random
from typing import Dict, Iterator, List, Optional, Sequence

from zipvoice_tpu.data.manifest import Cut


class DynamicBucketingSampler:
    def __init__(
        self,
        cuts: Sequence[Cut],
        max_duration: float = 250.0,
        num_buckets: int = 30,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 42,
        quadratic_duration: Optional[float] = None,
    ):
        self.cuts = list(cuts)
        self.max_duration = max_duration
        self.num_buckets = num_buckets
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.quadratic_duration = quadratic_duration
        self.epoch = 0
        self._resume_batch = 0
        self._cur_batch = 0

        durations = sorted(c.duration for c in self.cuts)
        n = len(durations)
        # equal-mass duration boundaries
        self.boundaries = [
            durations[min(n - 1, (n * i) // num_buckets)]
            for i in range(1, num_buckets)
        ]

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def state_dict(self) -> Dict:
        return {
            "epoch": self.epoch,
            "batch": self._cur_batch,
            "seed": self.seed,
        }

    def load_state_dict(self, state: Dict) -> None:
        self.epoch = state["epoch"]
        self._resume_batch = state["batch"]
        self.seed = state["seed"]

    def _bucket_of(self, d: float) -> int:
        import bisect

        return bisect.bisect_right(self.boundaries, d)

    def __iter__(self) -> Iterator[List[Cut]]:
        rng = random.Random(self.seed + self.epoch)
        order = list(range(len(self.cuts)))
        if self.shuffle:
            rng.shuffle(order)

        buckets: List[List[Cut]] = [[] for _ in range(self.num_buckets)]
        bucket_dur = [0.0] * self.num_buckets
        batches = []
        for idx in order:
            cut = self.cuts[idx]
            b = self._bucket_of(cut.duration)
            d = cut.duration
            if self.quadratic_cost(d) + bucket_dur[b] > self.max_duration and buckets[b]:
                batches.append(buckets[b])
                buckets[b] = []
                bucket_dur[b] = 0.0
            buckets[b].append(cut)
            bucket_dur[b] += self.quadratic_cost(d)
        if not self.drop_last:
            for b in range(self.num_buckets):
                if buckets[b]:
                    batches.append(buckets[b])
        if self.shuffle:
            rng.shuffle(batches)

        start = self._resume_batch
        self._resume_batch = 0
        for i, batch in enumerate(batches):
            if i < start:
                continue
            self._cur_batch = i + 1
            yield batch

    def quadratic_cost(self, d: float) -> float:
        # lhotse-style quadratic duration penalty: attention is O(T^2), so
        # long cuts cost more than their length
        if self.quadratic_duration:
            return d + (d ** 2) / self.quadratic_duration
        return d

    def __len__(self):
        total = sum(c.duration for c in self.cuts)
        return max(1, int(total / self.max_duration))


class SimpleCutSampler(DynamicBucketingSampler):
    """No bucketing: sequential duration-bounded batching
    (reference datamodule.py SimpleCutSampler path)."""

    def __init__(self, cuts, max_duration=250.0, shuffle=True, seed=42,
                 drop_last=False):
        super().__init__(
            cuts, max_duration=max_duration, num_buckets=1, shuffle=shuffle,
            seed=seed, drop_last=drop_last,
        )
