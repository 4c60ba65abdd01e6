"""Inference CLI ("rs" = resolution scaler).

Flag parity with reference rs.py:117-124 (``--model --src --save_dir
--window_size --batch_size --worker``) plus ``--overlap`` (default 8 — fixes
the reference's zero-overlap seam artifacts, rs.py:16-27; pass ``--overlap 0``
for the reference's exact non-overlap tiling) and ``--spatial_devices`` for
multi-chip spatially-sharded inference.

Image path: load artifact -> overlap-tiled batched upscale -> PNG.
Video path: stream fixed-size frame batches -> SR -> encode (+ audio remux),
replacing rs.py:54-76. The double-normalization bug in the reference video
path (rs.py:63 — frames normalized on top of the artifact's baked normalize)
is intentionally NOT reproduced: the artifact owns all normalization.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..utils.general import VID_FORMATS


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Tiled SR inference (image or video)")
    parser.add_argument("--model", type=str, required=True, help="deployed artifact (.isr)")
    parser.add_argument("--src", type=str, required=True)
    parser.add_argument("--save_dir", type=str, default="result.png")
    parser.add_argument("--window_size", type=int, default=96,
                        help="tile size; 0 = whole-image (untiled) inference")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--worker", type=int, default=4, help="accepted for parity; unused")
    parser.add_argument("--overlap", type=int, default=8)
    parser.add_argument("--spatial_devices", type=int, default=1,
                        help="shard large images over N chips (halo exchange); "
                             "applies to the single-image/folder path — for "
                             "video/batch throughput use --data_devices")
    parser.add_argument("--spatial_grid", type=int, nargs=2, default=None,
                        metavar=("NY", "NX"),
                        help="2-D generalization of --spatial_devices: shard "
                             "one image over an NYxNX device grid with halo "
                             "exchange in both dimensions (less halo overhead "
                             "than 1-D row bands at 8+ chips)")
    parser.add_argument("--data_devices", type=int, default=1,
                        help="shard tile/frame batches over N chips (data "
                             "axis) — multi-chip serving throughput for the "
                             "tiled image, folder, and video paths; 0 = all "
                             "local devices. Mutually exclusive with "
                             "--spatial_devices")
    parser.add_argument("--tp_devices", type=int, default=1,
                        help="tensor parallelism: channel-shard the fast "
                             "families' trunk over N local devices (0 = "
                             "all), one psum per residual block — the "
                             "latency-bound serving axis for single images "
                             "when the batch is too small for "
                             "--data_devices. Covers fast AND denoise_fast "
                             "(downshuffle front + refine tail included); "
                             "the sr/denoise reference topologies serve via "
                             "--data_devices/--spatial_devices "
                             "(docs/PARALLELISM.md)")
    parser.add_argument("--int8", action="store_true",
                        help="serve the fast-family trunk in int8 (PTQ "
                             "with per-channel weights, self-calibrated on "
                             "crops of the first input — no dataset needed "
                             "at serving time; models/quantized.py). fast "
                             "families only (fast / denoise_fast); the "
                             "reference topologies' int8 was measured dead "
                             "(PERF.md)")
    parser.add_argument("--int8_percentile", type=float, default=None,
                        help="with --int8: calibrate activation scales to "
                             "this percentile of |x| instead of amax (e.g. "
                             "99.995) — clips outlier activations; measured "
                             "to recover ~0.75 dB of the amax PTQ cost on "
                             "high-fidelity x1 checkpoints (PERF.md)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler device trace of the "
                             "whole inference run into this directory "
                             "(TensorBoard-loadable) — the serving-side "
                             "counterpart of train.py --profile_dir")
    parser.add_argument("--compile_cache", type=str, default=None,
                        help="persistent XLA compilation cache directory so "
                             "repeat invocations skip the 20-40s first-call "
                             "compile (default ~/.cache/image_super_"
                             "resolution_tpu/xla_cache, or "
                             "$ISR_COMPILE_CACHE; pass 'off' to disable)")
    parser.add_argument("--codec", type=str, default=None,
                        help="ffmpeg video encoder (e.g. libx264, hevc_nvenc, "
                             "hevc_vaapi). Default 'auto': probe the "
                             "reference's hardware-encoder candidates "
                             "(utils/ffmpeg.py:45-52) functionally — first "
                             "one that encodes a test frame wins — falling "
                             "back to libx264; pass a name to pin one")
    return parser


def main(argv=None):
    opt = build_parser().parse_args(argv)
    return run(**vars(opt))


def run(
    model: str,
    src: str,
    save_dir: str = "result.png",
    window_size: int = 96,
    batch_size: int = 8,
    overlap: int = 8,
    worker: int = 4,
    spatial_devices: int = 1,
    data_devices: int = 1,
    spatial_grid=None,
    tp_devices: int = 1,
    int8: bool = False,
    int8_percentile: float | None = None,
    profile_dir: str | None = None,
    codec: str | None = None,
    compile_cache: str | None = None,
) -> Path:
    if profile_dir:
        # re-enter without the flag inside the trace window
        from ..utils.profiling import trace

        kwargs = {k: v for k, v in locals().items()
                  if k not in ("profile_dir", "trace")}
        with trace(profile_dir):
            result = run(**kwargs)
        print(f"profiler trace written to {profile_dir}")
        return result
    from ..infer.engine import TiledUpscaler
    from ..models.deploy import load_artifact
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache(compile_cache)

    if tp_devices < 0:
        raise SystemExit(
            f"--tp_devices must be >= 0 (0 = all local devices), "
            f"got {tp_devices}"
        )
    use_tp = tp_devices == 0 or tp_devices > 1
    # Orthogonal sharding modes stay mutually exclusive (the engine enforces
    # the other three). != 1, not > 1: 0 is the documented "all local
    # devices" sentinel for both axes and must conflict too. Checked before
    # the artifact load so bad flag combinations fail fast.
    if use_tp and (spatial_devices != 1 or data_devices != 1 or spatial_grid):
        raise SystemExit(
            "--tp_devices is mutually exclusive with --spatial_devices/"
            "--spatial_grid/--data_devices: pick ONE sharding axis"
        )
    if int8 and use_tp:
        raise SystemExit(
            "--int8 is mutually exclusive with --tp_devices (the TP wrapper "
            "shards the bf16 graph; an int8-TP path is not built)"
        )
    if int8 and (spatial_devices != 1 or spatial_grid):
        # The bf16 spatial path matches the whole image within 1 LSB; under
        # int8 the requantization at every conv input turns the sub-LSB
        # halo-truncation/reassociation differences into full quant steps
        # that cascade through the trunk (measured ~40 LSB), so the output
        # would depend on the device count. --data_devices stays allowed
        # (identical per-shard shapes -> bit-equal, tested).
        raise SystemExit(
            "--int8 is mutually exclusive with --spatial_devices/"
            "--spatial_grid: requantization amplifies band-boundary "
            "differences; use --data_devices for multi-chip int8 serving"
        )
    deployed = load_artifact(model)
    if (spatial_devices != 1 or spatial_grid) and (
        getattr(deployed.spec, "downshuffle", 1) or 1
    ) > 1:
        raise SystemExit(
            "--spatial_devices/--spatial_grid cannot serve a downshuffle>1 "
            "artifact (denoise_fast): band offsets shift the model's "
            "space_to_depth grid, so the output would depend on the device "
            "count; use --data_devices (x1 images are small per-tile anyway)"
        )
    if int8:
        from ..models.quantized import quantize_deployed

        try:  # quantize_deployed owns the family whitelist (single source
            # of truth); surface its ValueError as the same clean one-line
            # exit the other flag-validation errors use
            deployed = quantize_deployed(
                deployed, _int8_calib_batches(Path(src), window_size),
                percentile=int8_percentile,
            )
        except ValueError as e:
            raise SystemExit(str(e)) from None
    if use_tp:
        # Channel-shard the model itself; the engine tiles through the TP
        # wrapper unchanged.
        import jax

        from ..core.mesh import make_mesh
        from ..parallel.tensor import TPFastUpscaler

        local = jax.local_devices()
        n_tp = tp_devices or len(local)
        if n_tp > len(local):
            raise SystemExit(
                f"--tp_devices {n_tp}: only {len(local)} local devices"
            )
        try:
            deployed = TPFastUpscaler(
                deployed, make_mesh(n_data=1, n_tile=n_tp, devices=local)
            )
        except ValueError as e:
            # wrapper-level validation (family/downshuffle/refine/width
            # divisibility) -> the same clean one-line exit as the CLI guards
            raise SystemExit(str(e))
    try:
        engine = TiledUpscaler(
            deployed,
            window=window_size,
            overlap=overlap,
            batch_size=batch_size,
            spatial_devices=spatial_devices,
            data_devices=data_devices,
            spatial_grid=spatial_grid,
        )
    except ValueError as e:
        # engine-level flag/geometry validation (mode exclusivity, downshuffle
        # grid alignment) -> the same clean one-line exit as the CLI guards
        raise SystemExit(str(e))
    src_path = Path(src)
    out_path = Path(save_dir)

    if src_path.is_dir():
        # Batch mode: one loaded model / one compile serves every image in
        # the folder — per-invocation model setup dominates single-image CLI
        # latency, so production batches should go through this path.
        from ..utils.general import IMG_FORMATS

        images = sorted(
            p for p in src_path.iterdir()
            if p.suffix.lower() in IMG_FORMATS
        )
        if not images:
            raise FileNotFoundError(f"no images in {src_path}")
        out_path.mkdir(parents=True, exist_ok=True)
        # Outputs are always .png; photo.jpg and photo.png share a stem, so
        # disambiguate duplicate stems by folding the whole source name in.
        # Names keep every interior dot ("a.v2.jpg" -> "a.v2.png") — suffix
        # REPLACEMENT would truncate at the last dot and collide.
        from collections import Counter

        stem_counts = Counter(p.stem for p in images)
        bases = [
            p.name[: -len(p.suffix)] if stem_counts[p.stem] == 1
            else p.name.replace(".", "_")
            for p in images
        ]
        # Dot-folding can STILL collide with a distinct source (photo.jpg vs
        # photo_jpg.png both -> photo_jpg.png): uniquify with a numeric
        # suffix so no batch output silently overwrites another.
        used: set = set()
        out_names = []
        for base in bases:
            name, k = f"{base}.png", 1
            while name in used:
                name = f"{base}_{k}.png"
                k += 1
            used.add(name)
            out_names.append(name)
        # Pipelined like the video path: a small IO pool reads the NEXT
        # image and writes the PREVIOUS result while the device upscales the
        # current one — decode/encode hide behind compute on real hosts.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        failed = []

        def fail(name, e):
            import warnings

            failed.append(name)
            warnings.warn(f"skipping {name}: {type(e).__name__}: {e}")

        items = list(zip(images, out_names))
        with ThreadPoolExecutor(max_workers=2) as io_pool:
            depth = 2
            reads = deque(
                (p, name, io_pool.submit(_read_image_rgb, p))
                for p, name in items[:depth]
            )
            next_i = len(reads)
            writes = []
            while reads:
                p, out_name, fut = reads.popleft()
                if next_i < len(items):
                    p2, n2 = items[next_i]
                    reads.append((p2, n2, io_pool.submit(_read_image_rgb, p2)))
                    next_i += 1
                try:  # one bad file must not kill the batch
                    image = fut.result()
                    print("input shape", image.shape, p.name)
                    result = engine.upscale_image(image)
                    writes.append(
                        (p.name, io_pool.submit(_write_png, out_path / out_name,
                                                result))
                    )
                except Exception as e:
                    fail(p.name, e)
            for name, wf in writes:
                try:
                    wf.result()
                except Exception as e:
                    fail(name, e)
        if failed:
            print(f"batch done with {len(failed)} failure(s): {failed[:5]}")
            if len(failed) == len(images):
                raise RuntimeError("every image in the batch failed")
        return out_path
    if src_path.suffix.lower() in VID_FORMATS:
        # engine.batch_size, not the raw flag: with --data_devices the engine
        # rounds the batch up to a multiple of the device count, and feeding
        # smaller source batches would pad EVERY dispatch (throughput waste
        # on the exact path the flag exists to speed up).
        return _run_video(engine, deployed, src_path, out_path,
                          engine.batch_size, codec=codec)
    return _run_image(engine, src_path, out_path)


def _grid_crops(img: np.ndarray, c: int, ny: int, nx: int) -> list:
    h, w = img.shape[:2]
    c = max(1, min(c, h, w))  # images smaller than the crop: use them whole
    ys = np.linspace(0, h - c, ny, dtype=int)
    xs = np.linspace(0, w - c, nx, dtype=int)
    return [img[y:y + c, x:x + c] for y in ys for x in xs]


def _int8_calib_batches(src_path: Path, window: int) -> list:
    """PTQ calibration data from the input itself. Activation scales are
    per-tensor scalars, so any representative crop size works for any
    serving shape. Folders sample crops from up to 8 images spread across
    the batch (calibrating on the first image alone would clip every
    other output when that image is unrepresentative — e.g. a near-black
    title card would make textured images saturate at every conv input);
    single images contribute a crop grid; video uses the first frames."""
    if src_path.suffix.lower() in VID_FORMATS and src_path.is_file():
        from ..video.reader import VideoSource

        source = VideoSource(src_path)
        try:
            batch, n_valid = next(iter(source.batches(4)))
            return [batch[:n_valid]]
        finally:
            source.close()
    c = window or 96
    if src_path.is_dir():
        from ..utils.general import IMG_FORMATS

        images = sorted(
            p for p in src_path.iterdir() if p.suffix.lower() in IMG_FORMATS
        )
        if not images:
            raise FileNotFoundError(f"no images in {src_path}")
        sel = images[:: max(1, len(images) // 8)][:8]
        imgs = []
        for p in sel:  # the folder serving loop tolerates bad files; a
            try:  # corrupt calibration sample must not kill the batch either
                imgs.append(_read_image_rgb(p))
            except Exception as e:
                print(f"int8 calibration: skipping unreadable {p}: {e}")
        if not imgs:
            raise FileNotFoundError(
                f"no readable calibration images among {len(sel)} sampled "
                f"from {src_path}"
            )
        # one COMMON crop size across images -> one stacked batch -> the
        # calibration forward compiles once
        c = max(1, min([c] + [min(i.shape[:2]) for i in imgs]))
        crops = [crop for i in imgs
                 for crop in _grid_crops(i, c, 1, max(1, 8 // len(imgs)))]
    else:
        img = _read_image_rgb(src_path)
        c = max(1, min(c, *img.shape[:2]))
        crops = _grid_crops(img, c, 2, 4)
    return [np.stack(crops)]


def _read_image_rgb(path: Path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))
    return img[..., ::-1].copy()


def _write_png(out: Path, result_rgb: np.ndarray) -> Path:
    import cv2

    out.parent.mkdir(parents=True, exist_ok=True)
    if not cv2.imwrite(str(out), result_rgb[..., ::-1]):
        raise IOError(f"failed to write {out}")
    print("output shape", result_rgb.shape, str(out))
    return out


def _run_image(engine, src: Path, out: Path) -> Path:
    image = _read_image_rgb(src)
    print("input shape", image.shape)
    result = engine.upscale_image(image)
    if out.suffix.lower() != ".png":  # append, never replace: "a.v2" is a
        out = out.parent / (out.name + ".png")  # stem, not a suffix to drop
    return _write_png(out, result)


def _run_video(engine, deployed, src: Path, out: Path, batch_size: int,
               codec: str | None = None) -> Path:
    """Pipelined video SR: three stages overlapped.

    - a background thread DECODES the next batch (cv2 releases the GIL);
    - the device COMPUTES the current batch (dispatch, no fetch);
    - the main thread FETCHES + ENCODES the previous batch meanwhile.

    The reference loop (rs.py:60-74) serialized decode -> compute -> fetch
    -> encode per batch; here each stage hides behind the slowest one.
    Output is identical (tests/test_video.py)."""
    import queue
    import threading

    from ..video.reader import VideoSource
    from ..video.recorder import FFMPEGRecorder

    source = VideoSource(src)
    out = out.with_suffix(".mp4")
    out.parent.mkdir(parents=True, exist_ok=True)
    scale = deployed.spec.output_scale
    recorder = FFMPEGRecorder(
        str(out),
        video_dimensions=(source.width * scale, source.height * scale),
        fps=source.fps,
        codec=codec,
    )

    q: "queue.Queue" = queue.Queue(maxsize=2)
    done = object()
    stop = threading.Event()
    producer_exc: list = []

    def put(item) -> bool:
        # Bounded put that gives up once the consumer stopped (mirrors
        # DevicePrefetcher._put) — a plain q.put would re-block after a
        # single drain and leak the thread on encode/compute failure.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def decode():
        try:
            for item in source.batches(batch_size):
                if not put(item):
                    return
        except BaseException as e:  # surface decoder failures to the consumer
            producer_exc.append(e)
        finally:
            put(done)

    producer = threading.Thread(target=decode, daemon=True)
    producer.start()

    n = 0
    pending = None  # (device result, n_valid) — fetched one batch behind
    body_ok = False
    try:
        while True:
            item = q.get()
            if item is done:
                break
            batch, n_valid = item
            sr_dev, _ = engine.upscale_batch_device(batch)
            if pending is not None:  # previous batch: fetch + encode now,
                for frame in np.asarray(pending[0])[: pending[1]]:  # overlapped
                    recorder.write_frame(frame[..., ::-1])  # RGB -> BGR
                    n += 1
            pending = (sr_dev, n_valid)
        if pending is not None:
            for frame in np.asarray(pending[0])[: pending[1]]:
                recorder.write_frame(frame[..., ::-1])
                n += 1
        if producer_exc:
            raise RuntimeError("video decode failed") from producer_exc[0]
        body_ok = True
    finally:
        stop.set()
        while True:  # drain so a put-blocked producer observes the stop
            try:
                q.get_nowait()
            except queue.Empty:
                break
        producer.join(timeout=30)
        # always release the ffmpeg child + capture, even on failure —
        # library/repeated use would otherwise leak both. stop_recorder can
        # itself raise on a dead ffmpeg pipe (its stdin.close flushes into
        # the broken pipe; the child is still reaped — recorder.py). That
        # must not mask an in-flight exception or skip releasing the
        # capture, but on the SUCCESS path it must PROPAGATE: a dead
        # encoder means the written file is truncated, and returning
        # success for a corrupt video is worse than the traceback.
        # (body_ok, not sys.exc_info(): the latter also sees an OUTER
        # handled exception when a caller runs us inside an except block
        # and would silently drop the error there.)
        stop_err = None
        try:
            recorder.stop_recorder()
        except Exception as e:
            stop_err = e
        source.close()
        if stop_err is not None and body_ok:
            raise stop_err
    recorder.add_audio(src)
    print(f"wrote {n} frames -> {out}")
    return out


if __name__ == "__main__":
    main()
