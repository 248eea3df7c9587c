"""Host streaming pipeline: manifest rows -> padded, bucketed device batches.

Replaces the reference's Dataset.map + DataLoader collate (SURVEY.md 3.1):
featurization happens *on device* per step, so the host only decodes wav and
pads. Bucket boundaries come from DataConfig; every bucket has one fixed
(audio_samples, text_len) shape so each bucket compiles exactly once
(SURVEY §7 hard-part 4). Multi-dialect joint training mixes manifests by
weight (SURVEY 3.4).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..utils.config import DataConfig
from .manifest import Manifest, ManifestRow
from .tokenizer import CharTokenizer
from ..frontend.audio_io import read_audio
from ..frontend.resample import resample


@dataclass
class Batch:
    """Host-side padded batch, ready for device put.

    Under multi-host SPMD the arrays hold only THIS process's shard of the
    global batch; `global_rows` is the full cross-process batch size (==
    len(audio) single-process) so parallel.mesh.shard_batch knows whether
    it is assembling a global array from local shards or replicating."""

    audio: np.ndarray  # [B_local, samples] float32 (or int16 wire format)
    audio_lengths: np.ndarray  # [B_local] int32 valid samples
    labels: np.ndarray  # [B_local, S] int32
    label_lengths: np.ndarray  # [B_local] int32
    texts: List[str]  # raw transcripts (eval)
    bucket_seconds: float
    global_rows: int = 0


def _bucket_for(duration: float, boundaries: Sequence[float]) -> float:
    i = bisect.bisect_left(list(boundaries), duration)
    return boundaries[min(i, len(boundaries) - 1)]


class BatchIterator:
    """Deterministic, resumable batch iterator.

    State = (epoch, cursor into the epoch permutation); save/restore with
    `state_dict` / `load_state_dict` so checkpoint resume replays exactly
    (SURVEY §5.3 failure-recovery semantics).
    """

    def __init__(
        self,
        manifest: Manifest,
        tokenizer: CharTokenizer,
        cfg: DataConfig,
        sample_rate: int = 16000,
        drop_last: bool = True,
        shuffle: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.rows = list(
            manifest.filter_duration(cfg.min_audio_seconds, cfg.max_audio_seconds)
        )
        if not self.rows:
            raise ValueError("manifest is empty after duration filtering")
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.sample_rate = sample_rate
        self.drop_last = drop_last
        self.shuffle = shuffle
        # Multi-host SPMD (SURVEY §1.b "per-host sharding"): every process
        # computes the IDENTICAL seeded epoch plan of GLOBAL batches, then
        # collates only its contiguous row-slice of each batch. The iterator
        # state (epoch, cursor) is therefore global and identical across
        # processes — resume is exact even if the process count changes.
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        if self.process_count > 1 and cfg.batch_size % self.process_count:
            raise ValueError(
                f"batch_size={cfg.batch_size} must divide evenly over "
                f"{self.process_count} processes"
            )
        if cfg.transfer_dtype not in ("float32", "int16"):
            raise ValueError(
                f"transfer_dtype must be 'float32' or 'int16', got "
                f"{cfg.transfer_dtype!r}"
            )
        self.epoch = 0
        self.cursor = 0
        self._plan: Optional[List[List[int]]] = None
        self._plan_epoch = -1

    # -- checkpointable state ----------------------------------------------
    def state_dict(self) -> Dict:
        return {"epoch": self.epoch, "cursor": self.cursor}

    def load_state_dict(self, state: Dict) -> None:
        self.epoch = int(state["epoch"])
        self.cursor = int(state["cursor"])

    # -- iteration -----------------------------------------------------------
    def _epoch_plan(self) -> List[List[int]]:
        """Deterministic batch plan for the current epoch: shuffle rows,
        group by duration bucket, cut fixed-size batches per bucket, shuffle
        the batch order. Fully reproducible from (seed, epoch)."""
        rng = np.random.RandomState(self.cfg.shuffle_seed + self.epoch)
        order = rng.permutation(len(self.rows)) if self.shuffle else np.arange(len(self.rows))
        by_bucket: Dict[float, List[int]] = {}
        for i in order:
            b = _bucket_for(
                self.rows[i].duration or self.cfg.max_audio_seconds,
                self.cfg.bucket_boundaries_seconds,
            )
            by_bucket.setdefault(b, []).append(int(i))
        batches: List[List[int]] = []
        for b in sorted(by_bucket):
            idxs = by_bucket[b]
            for k in range(0, len(idxs), self.cfg.batch_size):
                chunk = idxs[k : k + self.cfg.batch_size]
                if len(chunk) == self.cfg.batch_size or not self.drop_last:
                    batches.append(chunk)
        if not batches:  # tiny corpus: fall back to one partial batch
            batches = [list(order[: self.cfg.batch_size])]
        if self.shuffle:
            rng.shuffle(batches)
        return batches

    def __iter__(self) -> Iterator[Batch]:
        return self

    def _plan_for_epoch(self) -> List[List[int]]:
        # the full-corpus permutation + bucketing is O(N log N) host work;
        # cache it per epoch or it throttles the prefetch thread every step
        if self._plan_epoch != self.epoch:
            self._plan = self._epoch_plan()
            self._plan_epoch = self.epoch
        return self._plan

    def __next__(self) -> Batch:
        plan = self._plan_for_epoch()
        if self.cursor >= len(plan):
            self.epoch += 1
            self.cursor = 0
            plan = self._plan_for_epoch()
        idxs = plan[self.cursor]
        self.cursor += 1
        rows = [self.rows[i] for i in idxs]
        bucket = max(
            _bucket_for(
                r.duration or self.cfg.max_audio_seconds,
                self.cfg.bucket_boundaries_seconds,
            )
            for r in rows
        )
        return self._collate(rows, bucket)

    def _collate(self, rows: List[ManifestRow], bucket_seconds: float) -> Batch:
        samples = int(bucket_seconds * self.sample_rate)
        global_rows = len(rows)
        if self.process_count > 1 and global_rows % self.process_count == 0:
            # this host decodes/pads only its slice; the bucket shape above
            # came from the FULL batch so shapes agree across processes
            k = global_rows // self.process_count
            rows = rows[self.process_index * k : (self.process_index + 1) * k]
        # else (ragged tiny-corpus batch): every host collates the full
        # batch; shard_batch replicates it — correct, just not DP-split
        B = len(rows)
        int16_wire = self.cfg.transfer_dtype == "int16"
        audio = np.zeros((B, samples), np.int16 if int16_wire else np.float32)
        alen = np.zeros((B,), np.int32)
        labels = np.zeros((B, self.cfg.max_text_len), np.int32)
        llen = np.zeros((B,), np.int32)
        texts = []
        for i, r in enumerate(rows):
            pcm, sr = read_audio(r.audio)
            if sr != self.sample_rate:
                import jax.numpy as jnp

                pcm = np.asarray(resample(jnp.asarray(pcm), sr, self.sample_rate))
            m = min(len(pcm), samples)
            if int16_wire:
                # exact roundtrip for 16-bit sources (f32 was i/32768, so
                # rint(f32*32768) == i); <=1 lsb quantization otherwise
                audio[i, :m] = np.clip(
                    np.rint(pcm[:m] * 32768.0), -32768, 32767
                ).astype(np.int16)
            else:
                audio[i, :m] = pcm[:m]
            alen[i] = m
            ids = self.tokenizer.encode(r.text)[: self.cfg.max_text_len]
            labels[i, : len(ids)] = ids
            llen[i] = len(ids)
            texts.append(r.text)
        return Batch(audio, alen, labels, llen, texts, bucket_seconds, global_rows)


class PrefetchIterator:
    """Background-thread prefetch wrapper around BatchIterator.

    The reference overlaps host featurization with GPU compute via
    DataLoader workers (SURVEY 3.1); here featurization is on-device, so the
    host work is just wav decode + padding — one prefetch thread with a
    small queue keeps the device fed. State save/restore delegates to the
    wrapped iterator (pending prefetched batches are discarded on save,
    which keeps resume exact: the cursor only advances when a batch is
    *produced*, so a restored run replays the not-yet-consumed batches).
    """

    def __init__(self, inner: BatchIterator, depth: int = 2):
        self.inner = inner
        self.depth = depth
        self._queue = None
        self._thread = None
        self._stop = None

    def _ensure_started(self):
        if self._thread is not None:
            return
        import queue
        import threading

        self._queue = queue.Queue(maxsize=self.depth)
        self._stop = threading.Event()

        def worker():
            try:
                while not self._stop.is_set():
                    batch = next(self.inner)
                    state = self.inner.state_dict()  # state AFTER producing batch
                    self._queue.put((batch, state))
            except BaseException as e:  # propagate instead of hanging the
                # trainer forever on queue.get (e.g. an unreadable wav file)
                self._queue.put((None, e))

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        self._ensure_started()
        batch, state = self._queue.get()
        if batch is None:
            raise RuntimeError("prefetch worker died") from state
        self._consumed_state = state
        return batch

    def state_dict(self) -> Dict:
        # state as of the last batch handed to the trainer (not the last
        # batch prefetched) — exact-resume safe
        return getattr(self, "_consumed_state", self.inner.state_dict())

    def load_state_dict(self, state: Dict) -> None:
        # must be called before iteration starts (thread starts lazily)
        assert self._thread is None, "load_state_dict after iteration started"
        self.inner.load_state_dict(state)


def make_batches(
    manifest: Manifest,
    tokenizer: CharTokenizer,
    cfg: DataConfig,
    num_batches: int,
    **kw,
) -> List[Batch]:
    """Materialize a fixed number of batches (tests / tiny corpora)."""
    it = BatchIterator(manifest, tokenizer, cfg, **kw)
    return [next(it) for _ in range(num_batches)]


def mix_manifests(
    manifests: Dict[str, Manifest], weights: Optional[Dict[str, float]] = None,
    seed: int = 0,
) -> Manifest:
    """Joint multi-dialect mixture: weighted sampling with replacement to the
    size of the largest corpus (SURVEY 3.4 joint schedule)."""
    names = sorted(manifests)
    if weights is None:
        weights = {n: 1.0 for n in names}
    rng = np.random.RandomState(seed)
    target = max(len(manifests[n]) for n in names)
    out: List[ManifestRow] = []
    probs = np.array([weights.get(n, 1.0) for n in names], np.float64)
    probs /= probs.sum()
    for _ in range(target * len(names)):
        n = names[rng.choice(len(names), p=probs)]
        rows = manifests[n].rows
        out.append(rows[rng.randint(len(rows))])
    return Manifest(out)
