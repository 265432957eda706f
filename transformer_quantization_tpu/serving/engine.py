"""Continuous-batching inference engine.

The reference has no serving path at all — evaluation runs through HF
``Trainer`` (SURVEY.md §2.6 "No serving path" row); this engine is the
framework's TPU-native serving component:

- requests (token ids or raw text) enter a queue and are assembled into
  batches by a scheduler thread: sequences bucket to the next
  power-of-two length, batches fill up to ``max_batch`` or flush after
  ``max_wait_ms`` — every (batch, seq) bucket hits one pre-compiled XLA
  program, so no recompiles in steady state
- the executor drives the quantized int8 path (packed weights + Pallas
  fused kernels when available); BERT-class models are single-forward
  encoders so "continuous batching" means dynamic batching with strict
  shape bucketing, not token-level interleaving
- per-request latency and aggregate throughput are metered
  (tokens/s + seq/s at 1 chip; the same engine drives an N-chip mesh by
  sharding the assembled batch over ``dp``)
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ServeConfig:
    max_batch: int = 32
    max_wait_ms: float = 2.0
    seq_buckets: Sequence[int] = (32, 64, 128)
    batch_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32)
    precompile: bool = False  # warm every (batch, seq) program at startup
    # DP serving: assembled batches are committed to this mesh with rows
    # sharded over its 'dp' axis (parallel/mesh.py); batch buckets round
    # up to multiples of dp so every device gets equal rows
    mesh: object = None
    # pack ids/mask/type_ids into ONE (3, B, S) int32 host array so each
    # batch costs a single host->device transfer instead of three — on a
    # remote-tunnel device every transfer is a ~ms round trip. The
    # forward must then accept the packed array (see unpack_batch).
    fused_transfer: bool = False
    # in-flight batches between the scheduler and the resolver; 2 = the
    # classic double-buffer, 3 tolerates host jitter on remote devices
    pipeline_depth: int = 2
    # admission control: maximum queued (not yet scheduled) requests;
    # 0 = unbounded. When full, submit_* raises QueueFullError and the
    # HTTP front end answers 503 instead of letting latency grow without
    # bound under overload.
    max_queue: int = 0


class QueueFullError(Exception):
    """Admission queue is full (ServeConfig.max_queue); shed the request."""


@dataclasses.dataclass
class _Request:
    ids: np.ndarray
    type_ids: Optional[np.ndarray]
    future: Future
    t_enqueue: float


class Metrics:
    def __init__(self):
        self.lock = threading.Lock()
        self.requests = 0
        self.tokens = 0
        self.batches = 0
        self.latencies: List[float] = []
        self.t0 = time.perf_counter()

    def record(self, n_req: int, n_tok: int, lats: List[float]):
        with self.lock:
            self.requests += n_req
            self.tokens += n_tok
            self.batches += 1
            self.latencies.extend(lats)

    def snapshot(self) -> Dict:
        with self.lock:
            dt = time.perf_counter() - self.t0
            lat = np.asarray(self.latencies) if self.latencies else np.zeros(1)
            return {
                "requests": self.requests,
                "tokens": self.tokens,
                "batches": self.batches,
                "wall_s": dt,
                "seq_per_sec": self.requests / dt if dt else 0.0,
                "tokens_per_sec": self.tokens / dt if dt else 0.0,
                "latency_ms_p50": float(np.percentile(lat, 50)) * 1e3,
                "latency_ms_p99": float(np.percentile(lat, 99)) * 1e3,
                "avg_batch": self.requests / max(self.batches, 1),
            }


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def unpack_batch(packed):
    """Split a fused-transfer (3, B, S) int32 array back into the model's
    batch dict — call this INSIDE the jitted forward so the split costs
    nothing (ServeConfig.fused_transfer)."""
    return {"input_ids": packed[0],
            "attention_mask": packed[1].astype(jnp.float32),
            "token_type_ids": packed[2]}


class ServingEngine:
    """Dynamic-batching executor over a jitted quantized forward.

    ``forward(batch_dict) -> logits`` must be jit-compiled and accept
    ``input_ids``/``attention_mask``/``token_type_ids`` of any bucketed
    shape (each shape compiles once, then caches).
    """

    def __init__(self, forward: Callable[[Dict], jax.Array],
                 cfg: Optional[ServeConfig] = None,
                 tokenizer=None):
        self.forward = forward
        self.cfg = cfg or ServeConfig()
        if self.cfg.mesh is not None:
            dp = self.cfg.mesh.shape["dp"]
            self.cfg.batch_buckets = tuple(
                b for b in self.cfg.batch_buckets if b % dp == 0) or (dp,)
        self.tokenizer = tokenizer
        self.metrics = Metrics()
        self._q: "queue.Queue[_Request]" = queue.Queue(
            maxsize=self.cfg.max_queue)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- lifecycle ----------------------------------------------------------

    def start(self):
        if self.cfg.precompile:
            self.warmup()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def warmup(self):
        """Compile every (batch, seq) bucket up front."""
        for s in self.cfg.seq_buckets:
            for b in self.cfg.batch_buckets:
                if b > self.cfg.max_batch:
                    continue
                if self.cfg.fused_transfer:
                    batch = jnp.zeros((3, b, s), jnp.int32)
                else:
                    batch = {
                        "input_ids": jnp.zeros((b, s), jnp.int32),
                        "attention_mask": jnp.zeros((b, s), jnp.float32),
                        "token_type_ids": jnp.zeros((b, s), jnp.int32),
                    }
                jax.block_until_ready(self.forward(batch))

    # -- request ingress ----------------------------------------------------

    def submit_ids(self, ids: Sequence[int],
                   type_ids: Optional[Sequence[int]] = None) -> Future:
        fut: Future = Future()
        # overlong inputs truncate to the largest compiled seq bucket —
        # _assemble would silently clip them there anyway; doing it at
        # ingress keeps queue accounting and the token metric honest
        s_max = max(self.cfg.seq_buckets)
        ids = np.asarray(ids, np.int32)[:s_max]
        if type_ids is not None:
            type_ids = np.asarray(type_ids, np.int32)[:s_max]
        try:
            self._q.put_nowait(_Request(ids, type_ids, fut,
                                        time.perf_counter()))
        except queue.Full:
            raise QueueFullError(
                f"serving queue full ({self.cfg.max_queue} pending)")
        return fut

    def submit_text(self, a: str, b: Optional[str] = None,
                    max_len: Optional[int] = None) -> Future:
        assert self.tokenizer is not None, "engine built without tokenizer"
        if max_len is None:
            max_len = max(self.cfg.seq_buckets)
        ids, types, mask = self.tokenizer.encode_pair(a, b, max_len)
        n = int(np.sum(mask))
        return self.submit_ids(ids[:n], types[:n])

    def classify(self, a: str, b: Optional[str] = None,
                 timeout: float = 60.0) -> np.ndarray:
        return self.submit_text(a, b).result(timeout)

    # -- scheduler ----------------------------------------------------------

    def _drain(self) -> List[_Request]:
        """Collect up to max_batch requests, waiting at most max_wait_ms
        after the first arrival."""
        out: List[_Request] = []
        try:
            out.append(self._q.get(timeout=0.05))
        except queue.Empty:
            return out
        deadline = time.perf_counter() + self.cfg.max_wait_ms / 1e3
        while len(out) < self.cfg.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                out.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return out

    def _assemble(self, reqs: List[_Request]) -> Dict[str, jnp.ndarray]:
        max_len = max(len(r.ids) for r in reqs)
        S = _bucket(max_len, self.cfg.seq_buckets)
        Bq = _bucket(len(reqs), self.cfg.batch_buckets)
        ids = np.zeros((Bq, S), np.int32)
        mask = np.zeros((Bq, S), np.float32)
        types = np.zeros((Bq, S), np.int32)
        for i, r in enumerate(reqs):
            n = min(len(r.ids), S)
            ids[i, :n] = r.ids[:n]
            mask[i, :n] = 1.0
            if r.type_ids is not None:
                types[i, :n] = r.type_ids[:n]
        if self.cfg.fused_transfer:
            packed = np.stack([ids, mask.astype(np.int32), types])
            if self.cfg.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                return jax.device_put(
                    packed, NamedSharding(self.cfg.mesh,
                                          P(None, "dp", None)))
            return jnp.asarray(packed)
        batch = {"input_ids": ids, "attention_mask": mask,
                 "token_type_ids": types}
        if self.cfg.mesh is not None:
            from transformer_quantization_tpu.parallel.scaling import (
                shard_for_dp,
            )

            return shard_for_dp(batch, self.cfg.mesh)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _loop(self):
        """Scheduler: assemble + dispatch. Device execution and the
        device->host transfer complete on the resolver thread, so the next
        batch is already enqueued while the previous one runs (depth-2
        pipeline; jax dispatch is async)."""
        inflight: "queue.Queue" = queue.Queue(
            maxsize=max(self.cfg.pipeline_depth, 1))
        resolver = threading.Thread(target=self._resolve_loop,
                                    args=(inflight,), daemon=True)
        resolver.start()
        try:
            while not self._stop.is_set():
                reqs = self._drain()
                if not reqs:
                    continue
                try:
                    batch = self._assemble(reqs)
                    logits = self.forward(batch)  # async dispatch
                    inflight.put((reqs, logits))
                except Exception as e:  # surface errors to callers
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)
        finally:
            inflight.put(None)
            resolver.join(timeout=30)

    def _resolve_loop(self, inflight: "queue.Queue"):
        while True:
            item = inflight.get()
            if item is None:
                return
            reqs, logits = item
            try:
                arr = np.asarray(logits)  # blocks until compute+transfer done
                t_done = time.perf_counter()
                for i, r in enumerate(reqs):
                    r.future.set_result(arr[i])
                self.metrics.record(
                    len(reqs), int(sum(len(r.ids) for r in reqs)),
                    [t_done - r.t_enqueue for r in reqs])
            except Exception as e:
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

    # -- offline benchmark --------------------------------------------------

    def run_closed_loop(self, requests: List[np.ndarray],
                        concurrency: int = 64) -> Dict:
        """Feed a fixed request list with bounded in-flight concurrency;
        returns the metrics snapshot."""
        self.metrics = Metrics()  # exclude engine warmup/compiles
        sem = threading.Semaphore(concurrency)
        futures = []
        for ids in requests:
            sem.acquire()
            f = self.submit_ids(ids)
            f.add_done_callback(lambda _f: sem.release())
            futures.append(f)
        for f in futures:
            f.result(timeout=600)
        return self.metrics.snapshot()
