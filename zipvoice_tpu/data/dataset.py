"""Speech-synthesis dataset: cuts -> padded numpy training batches.

Replaces the reference's SpeechSynthesisDataset + DataLoader stack
(reference zipvoice/dataset/dataset.py:11-106, datamodule.py) with a
host-side iterator producing static-shape arrays:

- features come precomputed (.npy via bin/compute_fbank.py) or on-the-fly
  (VocosFbank);
- token ids from the cut's cached ``tokens`` (prepare_tokens) or by
  tokenizing text on the fly;
- frame and token lengths are padded up to bucketed sizes so the jitted
  train step compiles a handful of shapes;
- a background thread prefetches batches (the reference uses DataLoader
  workers).
"""

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from zipvoice_tpu.data.manifest import Cut
from zipvoice_tpu.frontend.batch import bucket_length
from zipvoice_tpu.frontend.feature import VocosFbank

FRAME_BUCKETS = tuple(128 * i for i in range(1, 32))
TOKEN_BUCKETS = tuple(32 * i for i in range(1, 32))
BATCH_BUCKETS = tuple(2 ** i for i in range(0, 10))


class SpeechSynthesisDataset:
    def __init__(
        self,
        tokenizer=None,
        on_the_fly_feats: bool = False,
        feat_scale: float = 0.1,
        sampling_rate: int = 24000,
        num_channels: int = 1,
        return_text: bool = False,
        pad_to_buckets: bool = True,
        local_rows_fn=None,
    ):
        self.tokenizer = tokenizer
        self.on_the_fly_feats = on_the_fly_feats
        self.feat_scale = feat_scale
        # local_rows_fn(padded_batch_size) -> global row indices this
        # process materializes (per-host data loading); None = full batch
        self.local_rows_fn = local_rows_fn
        self.sampling_rate = sampling_rate
        self.extractor = VocosFbank(num_channels=num_channels)
        self.return_text = return_text
        self.pad_to_buckets = pad_to_buckets

    def _features_of(self, cut: Cut) -> np.ndarray:
        if cut.features is not None and not self.on_the_fly_feats:
            return cut.load_features()
        wav = cut.load_audio(self.sampling_rate)
        return self.extractor.extract(wav, self.sampling_rate)

    def _tokens_of(self, cut: Cut) -> List[int]:
        if cut.tokens is not None:
            return self.tokenizer.tokens_to_token_ids([cut.tokens])[0]
        return self.tokenizer.texts_to_token_ids([cut.text])[0]

    def _num_frames_of(self, cut: Cut) -> int:
        """Frame count from metadata alone (no feature IO) — used by the
        per-host materialization path so every process derives identical
        global batch shapes without loading other processes' rows."""
        if cut.num_frames is not None and not self.on_the_fly_feats:
            return int(cut.num_frames)
        from zipvoice_tpu.frontend.feature import compute_num_frames

        dur = (cut.end - cut.start) if cut.end is not None else cut.duration
        n_samples = int(round(dur * self.sampling_rate))
        return compute_num_frames(n_samples, self.extractor.config.hop_length)

    def __call__(self, cuts: Sequence[Cut], local_rows=None
                 ) -> Dict[str, np.ndarray]:
        """cuts -> padded batch arrays.

        ``local_rows``: None materializes the full batch.  An index array
        materializes ONLY those global rows (ascending) — the per-host data
        path (reference shards the sampler per DDP rank,
        datamodule.py:177-195; here the batch *composition* stays global so
        all hosts agree on padded shapes, and the expensive feature IO is
        sharded).  The returned arrays then have leading dim len(local_rows)
        and carry ``global_batch_size`` for
        jax.make_array_from_process_local_data.
        """
        if local_rows is None and self.local_rows_fn is not None:
            B_pad = (
                bucket_length(len(cuts), BATCH_BUCKETS)
                if self.pad_to_buckets else len(cuts)
            )
            local_rows = self.local_rows_fn(B_pad)
        if local_rows is not None and local_rows is not False:
            return self._call_local(cuts, np.asarray(local_rows, np.int64))
        feats = [self._features_of(c) for c in cuts]
        token_ids = [self._tokens_of(c) for c in cuts]

        B_real = len(cuts)
        T_real = max(f.shape[0] for f in feats)
        S_real = max(len(t) for t in token_ids) + 1
        if self.pad_to_buckets:
            B = bucket_length(B_real, BATCH_BUCKETS)
            T = bucket_length(T_real, FRAME_BUCKETS)
            S = bucket_length(S_real, TOKEN_BUCKETS)
        else:
            B, T, S = B_real, T_real, S_real

        F = feats[0].shape[1]
        pad_id = self.tokenizer.pad_id if self.tokenizer else 0
        features = np.zeros((B, T, F), np.float32)
        features_lens = np.zeros((B,), np.int32)
        tokens = np.full((B, S), pad_id, np.int32)
        tokens_lens = np.zeros((B,), np.int32)
        for i, (f, tok) in enumerate(zip(feats, token_ids)):
            features[i, : f.shape[0]] = f * self.feat_scale
            features_lens[i] = f.shape[0]
            tokens[i, : len(tok)] = tok
            tokens_lens[i] = len(tok)
        # padded rows replicate row 0 so the model sees no degenerate zeros
        for i in range(B_real, B):
            features[i] = features[0]
            features_lens[i] = features_lens[0]
            tokens[i] = tokens[0]
            tokens_lens[i] = tokens_lens[0]

        batch = {
            "features": features,
            "features_lens": features_lens,
            "tokens": tokens,
            "tokens_lens": tokens_lens,
            "valid": (np.arange(B) < B_real),
        }
        if self.return_text:
            batch["text"] = [c.text for c in cuts]
            batch["ids"] = [c.id for c in cuts]
        return batch

    def _call_local(self, cuts: Sequence[Cut],
                    rows: np.ndarray) -> Dict[str, np.ndarray]:
        """Materialize only ``rows`` of the (conceptually global) batch.

        Shape decisions (B, T, S) use metadata for EVERY row — identical on
        all processes — while feature IO runs only for local rows.  Padded
        rows replicate global row 0 (same contract as the full path), so
        per-host and replicated training are bit-identical.
        """
        B_real = len(cuts)
        frame_counts = [self._num_frames_of(c) for c in cuts]
        token_ids = [self._tokens_of(c) for c in cuts]
        T_real = max(frame_counts)
        S_real = max(len(t) for t in token_ids) + 1
        if self.pad_to_buckets:
            B = bucket_length(B_real, BATCH_BUCKETS)
            T = bucket_length(T_real, FRAME_BUCKETS)
            S = bucket_length(S_real, TOKEN_BUCKETS)
        else:
            B, T, S = B_real, T_real, S_real
        assert rows.size == 0 or int(rows.max()) < B, (rows, B)

        cache: Dict[int, np.ndarray] = {}

        def feats_of(r: int) -> np.ndarray:
            if r not in cache:
                f = self._features_of(cuts[r])
                n = frame_counts[r]
                if f.shape[0] != n:
                    # duration-estimated count can be off by a frame for
                    # on-the-fly cuts; the metadata count is the global
                    # contract, so conform the features to it
                    f = f[:n] if f.shape[0] > n else np.pad(
                        f, ((0, n - f.shape[0]), (0, 0))
                    )
                cache[r] = f
            return cache[r]

        assert len(rows), "process owns no batch rows"
        F = feats_of(int(rows[0]) if rows[0] < B_real else 0).shape[1]
        pad_id = self.tokenizer.pad_id if self.tokenizer else 0
        n_local = len(rows)
        features = np.zeros((n_local, T, F), np.float32)
        features_lens = np.zeros((n_local,), np.int32)
        tokens = np.full((n_local, S), pad_id, np.int32)
        tokens_lens = np.zeros((n_local,), np.int32)
        for j, r in enumerate(rows):
            src = int(r) if r < B_real else 0  # padded rows mirror row 0
            f = feats_of(src)
            features[j, : f.shape[0]] = f * self.feat_scale
            features_lens[j] = f.shape[0]
            tok = token_ids[src]
            tokens[j, : len(tok)] = tok
            tokens_lens[j] = len(tok)
        return {
            "features": features,
            "features_lens": features_lens,
            "tokens": tokens,
            "tokens_lens": tokens_lens,
            "valid": rows < B_real,
            "global_batch_size": B,
        }


def prefetch_batches(
    sampler, dataset, num_prefetch: int = 4, num_workers: int = 1
) -> Iterator[Dict[str, np.ndarray]]:
    """Prefetching iterator (the reference uses 8 DataLoader worker
    processes, datamodule.py:143-151).  ``num_workers`` > 1 assembles
    several batches concurrently in a thread pool — feature IO (np.load /
    wav decode / STFT via numpy) releases the GIL, so threads scale without
    process-spawn or pickling costs.  Batch order is preserved."""
    if num_workers <= 1:
        q: "queue.Queue" = queue.Queue(maxsize=num_prefetch)
        _DONE = object()

        def worker():
            try:
                for cuts in sampler:
                    q.put(dataset(cuts))
            finally:
                q.put(_DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _DONE:
                break
            yield item
        return

    from concurrent.futures import ThreadPoolExecutor

    max_inflight = max(num_prefetch, num_workers)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        inflight: "queue.Queue" = queue.Queue()
        it = iter(sampler)

        def submit_next() -> bool:
            try:
                cuts = next(it)
            except StopIteration:
                return False
            inflight.put(pool.submit(dataset, cuts))
            return True

        alive = True
        for _ in range(max_inflight):
            alive = submit_next()
            if not alive:
                break
        while not inflight.empty():
            fut = inflight.get()
            batch = fut.result()
            submit_next()
            yield batch
