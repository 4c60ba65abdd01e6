"""Training input pipeline: host-side decode/crop, device-side degradation.

The reference pipeline (utils/datasets.py:274-428) runs decode + crop +
resize + normalize per-sample on forked DataLoader workers and ships float32
tensors. TPU-first split instead:

- HOST (this module's ``PatchLoader``): decode + random-crop only, on a
  thread pool (cv2 releases the GIL), shipping uint8 NHWC batches — 4x less
  PCIe/host traffic than float32.
- DEVICE (``make_batch_fn``): resize / degrade / normalize fused into the
  jitted step (see degrade.py), double-buffered ahead of compute by
  ``DevicePrefetcher``.

Pairing rule preserved: LR and HR come from the SAME crop (datasets.py:344-355),
patch size rounded up to a multiple of scale via ground_up (datasets.py:283).
Images smaller than the patch are reflect-padded instead of crashing
(deviation: the reference relied on its manifest builder deleting small
images).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.general import ground_up
from . import degrade
from .transforms import IMAGENET_MEAN, IMAGENET_STD, normalize, to_tanh
from .manifest import load_manifest


def _read_rgb(path: str) -> Optional[np.ndarray]:
    """Decode to RGB HWC uint8; None on failure."""
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(path)
        return img[..., ::-1]  # BGR -> RGB
    except Exception:
        try:
            from PIL import Image

            with Image.open(path) as im:
                return np.asarray(im.convert("RGB"))
        except Exception:
            return None


def _random_crop(img: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    h, w = img.shape[:2]
    if h < size or w < size:
        img = np.pad(
            img,
            ((0, max(0, size - h)), (0, max(0, size - w)), (0, 0)),
            mode="reflect",
        )
        h, w = img.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return img[top : top + size, left : left + size]


def _pipelined(submit, n_batches: int, depth: int):
    """Bounded-lookahead pipeline shared by both loader backends: keep up to
    ``depth`` submitted batches in flight, yielding them in order."""
    from collections import deque

    pending = deque(submit(b) for b in range(min(max(depth, 1), n_batches)))
    next_b = len(pending)
    for _ in range(n_batches):
        item = pending.popleft()
        yield item
        if next_b < n_batches:
            pending.append(submit(next_b))
            next_b += 1


@dataclass
class LoaderConfig:
    batch_size: int = 16
    patch_size: int = 96
    scale: int = 2
    workers: int = 4
    seed: int = 100
    drop_last: bool = True
    prefetch: int = 4
    # "auto": use the C++ loader (native/loader.cpp) when it builds on this
    # host, else the cv2/PIL thread pool; "native"/"python" force a backend.
    backend: str = "auto"


class PatchLoader:
    """Epoch-based uint8 patch loader over a manifest.

    Iterating yields (B, patch, patch, 3) uint8 arrays; ``steps_per_epoch``
    matches the reference's ``len(dataloader)`` used for schedule/EMA tau
    (train.py:231, 262).
    """

    # Dataset statistics default to ImageNet like the reference's class-level
    # mean/std (utils/datasets.py:275-276); calculate_stats() overrides them.
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD

    def __init__(
        self,
        manifest: str | Path | Sequence[str],
        config: LoaderConfig,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        if isinstance(manifest, (str, Path)):
            self.samples = load_manifest(manifest)
        else:
            self.samples = list(manifest)
        if not self.samples:
            raise ValueError("empty manifest")
        # The full (pre-stripe) manifest: dataset statistics must be computed
        # over this so every host bakes IDENTICAL mean/std constants into its
        # jitted program (striped stats would make hosts compile different
        # programs — silently divergent normalization).
        self.full_samples = list(self.samples)
        # Multi-host DP: each host loads a disjoint stripe of the manifest
        # (pass jax.process_index()/jax.process_count(); defaults single-host).
        # Stripes MUST be equal length: every host runs the same number of
        # lockstep SPMD steps per epoch, and a host that runs one extra step
        # blocks forever in its gradient psum while the others exit (confirmed
        # deadlock + cluster death with 23 images / 2 processes). So the
        # manifest remainder (< process_count images) is dropped — the
        # multi-host analog of drop_last.
        if process_count and process_count > 1:
            per_host = len(self.samples) // process_count
            if per_host == 0:
                raise ValueError(
                    f"manifest smaller than process_count={process_count}"
                )
            keep = per_host * process_count
            self.samples = self.samples[:keep][process_index or 0 :: process_count]
            assert len(self.samples) == per_host
        self.config = config
        self.process_count = int(process_count or 1)
        self.patch = ground_up(config.patch_size, max(config.scale, 1))
        self._epoch = 0
        self._backend_choice: Optional[str] = None

    def __len__(self) -> int:
        return self.steps_per_epoch

    @property
    def steps_per_epoch(self) -> int:
        n = len(self.samples) // self.config.batch_size
        if not self.config.drop_last and len(self.samples) % self.config.batch_size:
            n += 1
        return max(n, 1)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def calculate_stats(self, max_images: int = 512) -> Tuple[list, list]:
        """Dataset mean/std via running sums (the reference's intent at
        datasets.py:308-337, whose implementation was broken — SURVEY.md §2.2).

        Always computed over the FULL manifest (not the per-host stripe), so
        in multi-host runs every process derives the same constants and all
        SPMD programs compile identically. Hosts without a shared data
        filesystem may still skip DIFFERENT unreadable images, so in
        multi-host runs process 0's result is broadcast to everyone — the
        constants get baked into each host's compiled program and must match
        exactly.
        """
        s = np.zeros(3)
        ss = np.zeros(3)
        count = 0
        skipped = 0
        for path in self.full_samples[:max_images]:
            img = _read_rgb(path)
            if img is None:
                skipped += 1
                continue
            x = img.reshape(-1, 3).astype(np.float64) / 255.0
            s += x.sum(0)
            ss += (x**2).sum(0)
            count += x.shape[0]
        if skipped:
            import warnings

            warnings.warn(
                f"calculate_stats skipped {skipped} unreadable manifest "
                "image(s); stats computed from the readable remainder"
            )
        if count:
            mean = s / count
            std = np.sqrt(np.maximum(ss / count - mean**2, 1e-12))
            self.mean = tuple(float(v) for v in mean)
            self.std = tuple(float(v) for v in std)
        if self.process_count > 1:
            from jax.experimental import multihost_utils

            stats = multihost_utils.broadcast_one_to_all(
                np.asarray([self.mean, self.std], np.float64)
            )
            self.mean = tuple(float(v) for v in np.asarray(stats)[0])
            self.std = tuple(float(v) for v in np.asarray(stats)[1])
        return list(self.mean), list(self.std)

    def _load_patch(self, path: str, rng: np.random.Generator) -> np.ndarray:
        img = _read_rgb(path)
        if img is None:  # unreadable at train time: substitute a black patch
            return np.zeros((self.patch, self.patch, 3), np.uint8)
        return _random_crop(img, self.patch, rng)

    @property
    def uses_native(self) -> bool:
        """True when batches come from the C++ loader (native/loader.cpp).

        NOTE: the two backends draw crop offsets from different PRNGs
        (splitmix64 vs np.random.Generator), so runs are reproducible per
        backend but not ACROSS backends; the chosen backend is printed once
        so cross-machine runs can be compared knowingly.
        """
        if self._backend_choice is None:
            self._backend_choice = self._pick_backend()
            print(f"PatchLoader backend: {self._backend_choice}", flush=True)
        return self._backend_choice == "native"

    def _pick_backend(self) -> str:
        if self.config.backend == "python":
            return "python"
        from .. import native

        ok = native.available()
        if self.config.backend == "native":
            if not ok:
                raise RuntimeError(
                    "LoaderConfig.backend='native' but the C++ loader did not "
                    "build on this host (need g++, libjpeg, libpng)"
                )
            return "native"
        # auto: native only helps when it can actually decode the data —
        # for mostly-webp/bmp/tiff manifests every patch would pay a failed
        # C++ probe then a SERIAL Python re-decode, which is slower than the
        # Python thread pool.
        if not ok:
            return "python"
        decodable = sum(
            1 for p in self.samples
            if str(p).lower().endswith((".jpg", ".jpeg", ".png"))
        )
        return "native" if decodable * 2 >= len(self.samples) else "python"

    def _batch_indices(self, order: np.ndarray, b: int) -> np.ndarray:
        idx = order[b * self.config.batch_size : (b + 1) * self.config.batch_size]
        if len(idx) < self.config.batch_size:  # pad final partial batch
            # cycle the whole permutation: datasets smaller than batch_size
            # must still fill a full fixed-shape batch
            idx = np.concatenate(
                [idx, np.resize(order, self.config.batch_size - len(idx))]
            )
        return idx

    def _iter_native(self, order: np.ndarray, n_batches: int) -> Iterator[np.ndarray]:
        """One isr_load_patches call per batch: C++ decodes, crops, and fills
        the contiguous uint8 NHWC buffer with cfg.workers threads, GIL
        released for the whole call. Pipelined min(cfg.prefetch, 8) batches
        deep (each in-flight batch already runs cfg.workers native threads,
        so deep pipelines oversubscribe the host — hence the cap)."""
        from concurrent.futures import ThreadPoolExecutor

        from .. import native

        cfg = self.config

        def load_batch(b: int) -> np.ndarray:
            idx = self._batch_indices(order, b)
            seeds = [
                int(
                    np.random.SeedSequence(
                        [cfg.seed, self._epoch, b, int(i)]
                    ).generate_state(1, np.uint64)[0]
                )
                for i in idx
            ]
            return native.load_patches(
                [self.samples[i] for i in idx], self.patch, seeds,
                threads=max(cfg.workers, 1),
            )

        depth = min(max(cfg.prefetch, 1), 8)
        with ThreadPoolExecutor(max_workers=depth) as pool:
            for fut in _pipelined(
                lambda b: pool.submit(load_batch, b), n_batches, depth
            ):
                yield fut.result()

    def __iter__(self) -> Iterator[np.ndarray]:
        cfg = self.config
        rng = np.random.default_rng(np.random.SeedSequence([cfg.seed, self._epoch]))
        order = rng.permutation(len(self.samples))
        n_batches = self.steps_per_epoch

        if self.uses_native:
            yield from self._iter_native(order, n_batches)
            return

        from concurrent.futures import ThreadPoolExecutor

        # One future per PATCH (flat — never submit pool work from inside the
        # pool, which deadlocks when outer tasks saturate the workers).
        with ThreadPoolExecutor(max_workers=max(cfg.workers, 1)) as pool:
            def submit_batch(b: int):
                idx = self._batch_indices(order, b)
                return [
                    pool.submit(
                        self._load_patch,
                        self.samples[i],
                        np.random.default_rng(
                            np.random.SeedSequence([cfg.seed, self._epoch, b, int(i)])
                        ),
                    )
                    for i in idx
                ]

            for futures in _pipelined(submit_batch, n_batches, cfg.prefetch):
                yield np.stack([f.result() for f in futures])


@dataclass
class DegradeConfig:
    method: str = "bilinear"  # albumentations.Resize default (cv2.INTER_LINEAR)
    antialias: bool = False


def make_sr_batch_fn(
    scale: int,
    hr_mode: str = "tanh",  # "tanh" (pretrain phase) | "norm" (GAN phase)
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    degrade_cfg: DegradeConfig = DegradeConfig(),
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Device-side (hr, lr) preparation from a uint8 crop batch.

    hr_mode="tanh": HR in [-1,1] (pretrain, datasets.py:306);
    hr_mode="norm": HR mean/std-normalized (GAN phase after
    set_transform_hr(), datasets.py:339-342). LR is always
    normalize(downscale(x)) (datasets.py:291-305).
    """

    def fn(u8: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x01 = u8.astype(jnp.float32) / 255.0
        lr = normalize(
            degrade.downscale(x01, scale, degrade_cfg.method, degrade_cfg.antialias),
            mean, std,
        )
        hr = to_tanh(x01) if hr_mode == "tanh" else normalize(x01, mean, std)
        return hr, lr

    return fn


def make_denoise_batch_fn(
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> Callable[[jax.Array, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Device-side denoiser pairs: LR = normalize(jpeg(iso(gauss(x)))),
    HR = tanh(x) (utils/datasets.py:374-389)."""

    def fn(rng: jax.Array, u8: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x01 = u8.astype(jnp.float32) / 255.0
        lr = normalize(degrade.denoise_degradation(rng, x01), mean, std)
        hr = to_tanh(x01)
        return hr, lr

    return fn


class DevicePrefetcher:
    """Overlap host batch production with device compute.

    Double-buffers ``depth`` uint8 batches onto the device (optionally with a
    batch sharding) while the previous step runs — the TPU equivalent of
    pin_memory+non_blocking transfers (reference train.py:51).
    """

    def __init__(self, it: Iterator[np.ndarray], depth: int = 2, sharding=None):
        self._it = iter(it)
        self._sharding = sharding
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._exc: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Bounded put that gives up when the consumer called close() —
        otherwise an abandoned iteration (exception in the step loop) leaves
        this producer blocked on Queue.put forever."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _fill(self):
        try:
            multi_host = jax.process_count() > 1
            for batch in self._it:
                if self._stop.is_set():
                    return
                if self._sharding is not None:
                    if multi_host:
                        # each host loads its manifest stripe: this batch is
                        # the PER-PROCESS portion of the global batch
                        arr = jax.make_array_from_process_local_data(
                            self._sharding, np.asarray(batch)
                        )
                    else:
                        arr = jax.device_put(jnp.asarray(batch), self._sharding)
                else:
                    arr = jnp.asarray(batch)
                if not self._put(arr):
                    return
        except BaseException as e:  # propagate to the consumer, never swallow
            self._exc = e
        finally:
            self._put(self._done)

    def close(self) -> None:
        """Stop the producer and reclaim its thread (call from a finally)."""
        self._stop.set()
        while True:  # drain so a put-blocked producer can observe the stop
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._exc is not None:
                exc, self._exc = self._exc, None
                raise RuntimeError(
                    "DevicePrefetcher producer thread failed; training input "
                    "stream is broken (see chained exception)"
                ) from exc
            raise StopIteration
        return item
