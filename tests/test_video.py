"""Video backend tests: recorder fallback, reader round trip, rs video path."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from image_super_resolution_tpu.video.reader import VideoSource
from image_super_resolution_tpu.video.recorder import FFMPEGRecorder, second_to_timecode


def _write_test_video(path, n_frames=12, w=64, h=48, fps=10):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert writer.isOpened(), "cv2 mp4v encoder unavailable"
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n_frames):
        frame = np.full((h, w, 3), i * 20 % 255, np.uint8)
        frame[:10, :10] = rng.integers(0, 255, (10, 10, 3), dtype=np.uint8)
        writer.write(frame)
        frames.append(frame)
    writer.release()
    return frames


def test_recorder_writes_playable_video(tmp_path):
    out = tmp_path / "out.mp4"
    rec = FFMPEGRecorder(str(out), video_dimensions=(64, 48), fps=10)
    for i in range(10):
        rec.write_frame(np.full((48, 64, 3), i * 25, np.uint8))
        rec.write_subtitle(f"frame {i}")
    rec.stop_recorder()
    assert out.exists() and out.stat().st_size > 0
    cap = cv2.VideoCapture(str(out))
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    assert n == 10
    cap.release()
    # srt sidecar path works even without ffmpeg
    rec.add_subtitle()
    assert (tmp_path / "out.srt").read_text().startswith("0\n")


def test_timecode_format():
    assert second_to_timecode(0) == "00:00:00,000"
    assert second_to_timecode(3661.5) == "01:01:01,500"


def _write_fake_ffmpeg(tmp_path, listed, working):
    """A stub ffmpeg: prints an encoder table for -encoders; for a test
    encode (-c:v CODEC), exits 0 iff CODEC is in ``working``."""
    rows = "\n".join(f" V....D {name}" for name in listed)
    script = tmp_path / "ffmpeg"
    script.write_text(
        "#!/bin/sh\n"
        "for a in \"$@\"; do\n"
        f"  [ \"$a\" = \"-encoders\" ] && printf '{rows}\\n' && exit 0\n"
        "done\n"
        "prev=\"\"; codec=\"\"\n"
        "for a in \"$@\"; do\n"
        "  [ \"$prev\" = \"-c:v\" ] && codec=\"$a\"\n"
        "  prev=\"$a\"\n"
        "done\n"
        f"case \"$codec\" in {'|'.join(working) or 'NONE'}) exit 0;; esac\n"
        "exit 1\n"
    )
    script.chmod(0o755)
    return str(script)


def test_probe_encoder_picks_first_functional_hw(tmp_path):
    """hevc_nvenc is listed but fails its test encode (no GPU); hevc_vaapi
    both listed and functional wins. Reference order: utils/ffmpeg.py:45-52."""
    from image_super_resolution_tpu.video import recorder

    exe = _write_fake_ffmpeg(
        tmp_path, listed=["hevc_nvenc", "hevc_vaapi", "libx264"],
        working=["hevc_vaapi", "libx264"])
    assert recorder.probe_encoder(exe) == "hevc_vaapi"
    # cached per binary path: a second call must not re-run the probe
    assert recorder._probe_cache[exe] == "hevc_vaapi"
    assert recorder.probe_encoder(exe) == "hevc_vaapi"


def test_probe_encoder_falls_back_to_libx264(tmp_path):
    from image_super_resolution_tpu.video import recorder

    # HW encoders listed but none survives the functional encode
    exe = _write_fake_ffmpeg(
        tmp_path, listed=["hevc_nvenc", "hevc_vaapi", "libx264"], working=[])
    assert recorder.probe_encoder(exe) == "libx264"
    # nothing HW listed at all: no test encodes attempted, straight fallback
    sub = tmp_path / "sub"
    sub.mkdir()
    exe2 = _write_fake_ffmpeg(sub, listed=["libx264"], working=[])
    assert recorder.probe_encoder(exe2) == "libx264"


def test_recorder_auto_codec_uses_probe(tmp_path, monkeypatch):
    from image_super_resolution_tpu.video import recorder

    exe = _write_fake_ffmpeg(
        tmp_path, listed=["hevc_nvenc", "hevc_vaapi"], working=["hevc_nvenc"])
    monkeypatch.setattr(recorder, "_ffmpeg_exe", lambda: exe)
    rec = recorder.FFMPEGRecorder(
        str(tmp_path / "o.mp4"), video_dimensions=(8, 8), fps=5, codec="auto")
    assert rec.backend == "ffmpeg" and rec.codec == "hevc_nvenc"
    rec.stop_recorder()
    # explicit codec bypasses the probe entirely
    recorder._probe_cache.clear()
    rec2 = recorder.FFMPEGRecorder(
        str(tmp_path / "o2.mp4"), video_dimensions=(8, 8), fps=5,
        codec="libx264")
    assert rec2.codec == "libx264" and not recorder._probe_cache
    rec2.stop_recorder()


def test_reader_batches_fixed_shape(tmp_path):
    path = tmp_path / "in.mp4"
    _write_test_video(path, n_frames=10)
    src = VideoSource(path)
    assert src.width == 64 and src.height == 48
    batches = list(src.batches(4))
    assert [n for _, n in batches] == [4, 4, 2]
    for b, _ in batches:
        assert b.shape == (4, 48, 64, 3) and b.dtype == np.uint8
    src.close()


def test_rs_video_path(tmp_path):
    """Full video SR through the CLI: decode -> batched x2 SR -> encode."""
    import jax.numpy as jnp

    from image_super_resolution_tpu.cli.rs import main as rs_main
    from image_super_resolution_tpu.models.deploy import (
        DeploySpec,
        save_artifact,
    )
    from image_super_resolution_tpu.models import SRGenerator
    import jax

    path = tmp_path / "in.mp4"
    _write_test_video(path, n_frames=6)

    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    model = spec.build_model(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    artifact = tmp_path / "m.isr"
    save_artifact(artifact, spec, params)

    out = rs_main([
        "--model", str(artifact), "--src", str(path),
        "--save_dir", str(tmp_path / "up.mp4"), "--batch_size", "4",
    ])
    assert out.exists()
    cap = cv2.VideoCapture(str(out))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 96
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()


def test_video_stop_recorder_failure_propagates_inside_handler(
        tmp_path, monkeypatch):
    """A dead encoder at stop_recorder() means the written file is
    truncated, so the error must propagate on the success path — even when
    the CLI runs inside a caller's except block (retry wrapper, server
    handler), where sys.exc_info() is non-empty and a thread-state gate
    would silently swallow it. The gate must be a local success flag."""
    import jax
    import jax.numpy as jnp

    from image_super_resolution_tpu.cli.rs import main as rs_main
    from image_super_resolution_tpu.models.deploy import (
        DeploySpec,
        save_artifact,
    )
    from image_super_resolution_tpu.video import recorder as rec_mod

    path = tmp_path / "in.mp4"
    _write_test_video(path, n_frames=4)
    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    model = spec.build_model(dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    artifact = tmp_path / "m.isr"
    save_artifact(artifact, spec, params)

    real_stop = rec_mod.FFMPEGRecorder.stop_recorder

    def dying_stop(self):
        real_stop(self)  # still release the child/writer
        raise BrokenPipeError("encoder died at stop")

    monkeypatch.setattr(rec_mod.FFMPEGRecorder, "stop_recorder", dying_stop)
    try:
        raise KeyError("outer handled exception")
    except KeyError:
        with pytest.raises(BrokenPipeError, match="encoder died"):
            rs_main([
                "--model", str(artifact), "--src", str(path),
                "--save_dir", str(tmp_path / "up.mp4"), "--batch_size", "4",
            ])


def test_rs_video_path_data_devices(tmp_path):
    """Video SR with --data_devices: frame batches shard over the data mesh
    axis and the engine-rounded batch size feeds the source (no per-batch
    padding waste); the encoded output must match the single-device run
    frame for frame."""
    import jax
    import jax.numpy as jnp

    from image_super_resolution_tpu.cli.rs import main as rs_main
    from image_super_resolution_tpu.models import SRGenerator
    from image_super_resolution_tpu.models.deploy import (
        DeploySpec,
        save_artifact,
    )

    path = tmp_path / "in.mp4"
    _write_test_video(path, n_frames=6)

    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    model = spec.build_model(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    artifact = tmp_path / "m.isr"
    save_artifact(artifact, spec, params)

    def frames_of(p):
        cap = cv2.VideoCapture(str(p))
        fs = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            fs.append(f)
        cap.release()
        return np.stack(fs)

    out1 = rs_main([
        "--model", str(artifact), "--src", str(path),
        "--save_dir", str(tmp_path / "single.mp4"), "--batch_size", "4",
    ])
    out8 = rs_main([
        "--model", str(artifact), "--src", str(path),
        "--save_dir", str(tmp_path / "sharded.mp4"), "--batch_size", "4",
        "--data_devices", "8",
    ])
    f1, f8 = frames_of(out1), frames_of(out8)
    assert f1.shape == f8.shape == (6, 96, 128, 3)
    # same pixels in, same SR math, same encoder settings -> identical files
    np.testing.assert_array_equal(f1, f8)


def test_rs_video_path_denoise_fast(tmp_path):
    """x1 restoration video through the CLI with a denoise_fast artifact:
    output keeps frame size and count. (Odd frame dims cannot be tested
    through a real codec — cv2's mp4v rounds sources to even dims for
    yuv420; internal odd-size padding is covered by the image-path tests.)"""
    import jax
    import jax.numpy as jnp

    from image_super_resolution_tpu.cli.rs import main as rs_main
    from image_super_resolution_tpu.models.deploy import (
        DeploySpec,
        save_artifact,
    )

    path = tmp_path / "in.mp4"
    _write_test_video(path, n_frames=5, w=62, h=46)

    spec = DeploySpec(family="denoise_fast", depth=1, width=8, downshuffle=2)
    model = spec.build_model(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    artifact = tmp_path / "dn.isr"
    save_artifact(artifact, spec, params)

    out = rs_main([
        "--model", str(artifact), "--src", str(path),
        "--save_dir", str(tmp_path / "dn.mp4"), "--batch_size", "2",
    ])
    assert out.exists()
    cap = cv2.VideoCapture(str(out))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 62
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 46
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    cap.release()
