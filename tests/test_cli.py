"""Full end-to-end CLI slice on synthetic data (SURVEY.md §7 minimum slice):
create_json -> train (all three phases, 1 epoch, tiny nets) -> export -> rs.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

from image_super_resolution_tpu.cli.create_json import main as create_json_main
from image_super_resolution_tpu.cli.evaluate import main as eval_main
from image_super_resolution_tpu.cli.export import main as export_main
from image_super_resolution_tpu.cli.rs import main as rs_main
from image_super_resolution_tpu.cli.train import main as train_main


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Images + manifest + a pixel-phase checkpoint + exported artifact.

    Building the checkpoint/artifact HERE (not in a test) lets every test in
    this module run standalone under -k selection without depending on
    test execution order."""
    from PIL import Image

    ws = tmp_path_factory.mktemp("ws")
    img_dir = ws / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        base = rng.uniform(0, 255, (10, 10, 3))
        arr = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)  # smooth 80x80
        Image.fromarray(arr).save(img_dir / f"img_{i}.png")
    create_json_main([
        "--train_dirs", str(img_dir), "--val_dirs", str(img_dir),
        "--shape", "48", "--output", str(ws),
    ])
    assert (ws / "train_images.json").exists()

    train_main([
        "--resnet", "--scale", "2", "--save_name", "t",
        "--train_json", str(ws / "train_images.json"),
        "--work_dir", str(ws), *COMMON,
    ])
    export_main([
        "--checkpoint", str(ws / "res_t_1_0.2.ckpt"),
        "--out", str(ws / "model.isr"), "--rs_deep", "1", "--scale", "2",
    ])
    return ws


COMMON = ["--epochs", "1", "--batch_size", "2", "--rs_deep", "1",
          "--shape", "48", "--worker", "2", "--no_tensorboard"]


def _assert_really_trained(ckpt_path):
    """Round-1 bug: train CLI could run ZERO steps (prefetcher swallowed a
    sharding error) yet still write a checkpoint and exit 0. Assert the
    checkpoint records steps > 0 and a finite loss history."""
    from image_super_resolution_tpu.train import load_checkpoint

    meta = load_checkpoint(ckpt_path)["meta"]
    assert meta["step"] > 0, "checkpoint trained zero steps"
    assert meta["loss"], "empty loss history"
    assert np.all(np.isfinite(meta["loss"])), f"non-finite loss: {meta['loss']}"


def test_cli_pixel_phase_then_export_then_rs(workspace):
    """Verify the fixture's pixel train -> export chain, then run rs."""
    ws = workspace
    ckpt = ws / "res_t_1_0.2.ckpt"
    assert ckpt.exists()
    _assert_really_trained(ckpt)
    artifact = ws / "model.isr"
    assert artifact.exists()

    rs_main([
        "--model", str(artifact), "--src", str(ws / "imgs" / "img_0.png"),
        "--save_dir", str(ws / "out.png"),
        "--window_size", "48", "--overlap", "8", "--batch_size", "2",
    ])
    out = ws / "out.png"
    assert out.exists()
    from PIL import Image

    assert Image.open(out).size == (160, 160)  # 80x80 -> x2


def test_cli_resume_budget_semantics(workspace, tmp_path, capsys):
    """--resume budget semantics per phase (reference train.py:282-285 vs
    217-219): resuming a COMPLETED pixel run with the same --epochs is a
    no-op, a larger --epochs trains only the missing epochs (fresh
    optimizer), and a completed denoise run warm-restarts from epoch 0."""
    common = ["--scale", "2", "--save_name", "t",
              "--train_json", str(workspace / "train_images.json"),
              "--work_dir", str(tmp_path), "--batch_size", "2",
              "--rs_deep", "1", "--shape", "48", "--worker", "2",
              "--no_tensorboard"]
    train_main(["--resnet", *common, "--epochs", "1"])
    capsys.readouterr()
    train_main(["--resnet", "--resume", *common, "--epochs", "1"])
    assert "Epoch [" not in capsys.readouterr().out  # same budget: no-op
    train_main(["--resnet", "--resume", *common, "--epochs", "2"])
    out = capsys.readouterr().out
    assert "Epoch [1]" in out and "Epoch [0]" not in out  # pure top-up

    train_main(["--train_denoise", *common, "--epochs", "1"])
    capsys.readouterr()
    train_main(["--train_denoise", "--resume", *common, "--epochs", "1"])
    # reference denoise parity: optimizer-dropped ckpt -> restart at 0
    assert "Epoch [0]" in capsys.readouterr().out


def test_cli_pixel_resume(workspace):
    ws = workspace
    train_main([
        "--resnet", "--scale", "2", "--save_name", "t", "--resume",
        "--train_json", str(ws / "train_images.json"),
        "--work_dir", str(ws), "--epochs", "2", "--batch_size", "2",
        "--rs_deep", "1", "--shape", "48", "--no_tensorboard",
    ])
    assert (ws / "res_t_1_0.2.ckpt").exists()


def _train_gan(ws):
    """Run the GAN phase once; shared by the tests that need its checkpoint."""
    train_main([
        "--scale", "2", "--save_name", "t",
        "--train_json", str(ws / "train_images.json"),
        "--work_dir", str(ws), *COMMON,
    ])
    return ws / "gen_t_1_0.2.ckpt"


def test_cli_gan_phase_warm_start(workspace):
    ws = workspace
    ckpt = _train_gan(ws)
    assert ckpt.exists()
    _assert_really_trained(ckpt)


def test_cli_denoise_phase(workspace):
    ws = workspace
    train_main([
        "--train_denoise", "--save_name", "t",
        "--train_json", str(ws / "train_images.json"),
        "--work_dir", str(ws), *COMMON,
    ])
    ckpt = ws / "denoise_t_1_0.2.ckpt"
    assert ckpt.exists()
    _assert_really_trained(ckpt)
    artifact = ws / "denoise.isr"
    export_main([
        "--checkpoint", str(ckpt), "--out", str(artifact),
        "--family", "denoise", "--rs_deep", "1",
    ])
    rs_main([
        "--model", str(artifact), "--src", str(ws / "imgs" / "img_1.png"),
        "--save_dir", str(ws / "dn.png"),
        "--window_size", "48", "--overlap", "4", "--batch_size", "2",
    ])
    from PIL import Image

    assert Image.open(ws / "dn.png").size == (80, 80)  # x1 contract

    # Reverse interop from the CLI (round 2 rejected non-sr families here):
    # the denoise checkpoint exports a reference-layout Denoise state_dict.
    sd_path = ws / "denoise_ref.pt"
    export_main([
        "--checkpoint", str(ckpt), "--out", str(ws / "denoise2.isr"),
        "--family", "denoise", "--rs_deep", "1",
        "--torch_state_dict", str(sd_path),
    ])
    import torch

    from image_super_resolution_tpu.interop import import_denoiser_state

    payload = torch.load(sd_path, map_location="cpu", weights_only=False)
    assert payload["meta"]["family"] == "denoise"
    p2, _, cfg = import_denoiser_state(
        {k: v.numpy() for k, v in payload["state_dict"].items()}
    )
    # depth=1 has 1//2 = 0 pre-trunk residual blocks, so the round-tripped
    # config reports the even-equivalent depth 0; layout is what matters.
    assert cfg["depth"] == 0 and cfg["width"] == 64
    assert {"head", "down", "trunk_conv", "tail"} <= set(p2)


def test_cli_denoise_fast_phase(workspace):
    """The TPU-first denoiser through the real CLI chain: --train_denoise
    --family fast -> export --family denoise_fast (depth/width/downshuffle
    all inferred from the checkpoint) -> x1 rs -> evaluate --denoise_eval."""
    ws = workspace
    train_main([
        "--train_denoise", "--family", "fast", "--width", "8",
        "--save_name", "tf",
        "--train_json", str(ws / "train_images.json"),
        "--work_dir", str(ws), *COMMON,
    ])
    ckpt = ws / "denoise_tf_1_0.2.ckpt"
    assert ckpt.exists()
    _assert_really_trained(ckpt)
    artifact = ws / "denoise_fast.isr"
    export_main([
        "--checkpoint", str(ckpt), "--out", str(artifact),
        "--family", "denoise_fast",  # dims + downshuffle from the ckpt
    ])
    from image_super_resolution_tpu.models.deploy import load_artifact

    spec = load_artifact(artifact).spec
    assert (spec.depth, spec.width, spec.downshuffle) == (1, 8, 2)
    assert spec.output_scale == 1
    rs_main([
        "--model", str(artifact), "--src", str(ws / "imgs" / "img_1.png"),
        "--save_dir", str(ws / "dnf.png"),
        "--window_size", "48", "--overlap", "4", "--batch_size", "2",
    ])
    from PIL import Image

    assert Image.open(ws / "dnf.png").size == (80, 80)  # x1 contract

    # the denoise eval protocol: noisy input from the training chain
    result = eval_main([
        "--model", str(artifact), "--val_json", str(ws / "val_images.json"),
        "--shape", "48", "--batch_size", "2", "--max_images", "4",
        "--denoise_eval",
    ])
    assert "noisy_psnr" in result and np.isfinite(result["psnr_y"])

    # a --downshuffle that contradicts the checkpoint must fail at export,
    # not as an opaque conv-shape error at first inference
    with pytest.raises(SystemExit, match="contradicts"):
        export_main([
            "--checkpoint", str(ckpt), "--out", str(ws / "y.isr"),
            "--family", "denoise_fast", "--downshuffle", "4",
        ])

    # reverse interop is impossible for TPU-native-only families
    with pytest.raises(SystemExit, match="TPU-native"):
        export_main([
            "--checkpoint", str(ckpt), "--out", str(ws / "x.isr"),
            "--family", "denoise_fast", "--torch_state_dict", str(ws / "x.pt"),
        ])


def test_cli_denoise_fast_flag_guards():
    """--downshuffle is the fast denoiser's knob only; elsewhere it must
    fail fast, not silently change an unrelated run."""
    with pytest.raises(SystemExit, match="downshuffle"):
        train_main(["--resnet", "--downshuffle", "2", *COMMON])
    with pytest.raises(SystemExit, match="downshuffle"):
        train_main(["--train_denoise", "--downshuffle", "2", *COMMON])
    with pytest.raises(SystemExit, match="downshuffle"):
        train_main(["--train_denoise", "--family", "fast",
                    "--downshuffle", "0", *COMMON])


def test_cli_gan_discriminator_export(workspace):
    """The GAN checkpoint's Discriminator exports back to the reference
    layout from the export CLI (--torch_discriminator)."""
    ws = workspace
    ckpt = ws / "gen_t_1_0.2.ckpt"
    if not ckpt.exists():  # standalone run: build the checkpoint ourselves
        ckpt = _train_gan(ws)
    d_path = ws / "disc_ref.pt"
    export_main([
        "--checkpoint", str(ckpt), "--out", str(ws / "gen2.isr"),
        "--rs_deep", "1", "--scale", "2",
        "--torch_discriminator", str(d_path),
    ])
    import torch

    from image_super_resolution_tpu.interop import import_discriminator_state

    payload = torch.load(d_path, map_location="cpu", weights_only=False)
    p2, _ = import_discriminator_state(
        {k: v.numpy() for k, v in payload["state_dict"].items()}
    )
    assert "block0" in p2 and "fc1" in p2


def test_cli_rs_spatial_devices_on_default_artifact(workspace):
    """rs --spatial_devices N on a default-exported (optimized) SR artifact —
    the exact integration seam that crashed in round 1."""
    ws = workspace
    artifact = ws / "model.isr"
    assert artifact.exists()  # produced by the pixel-phase test above
    rs_main([
        "--model", str(artifact), "--src", str(ws / "imgs" / "img_2.png"),
        "--save_dir", str(ws / "sp.png"),
        "--spatial_devices", "4", "--overlap", "8",
    ])
    from PIL import Image

    assert Image.open(ws / "sp.png").size == (160, 160)


def test_cli_rs_spatial_grid_and_data_devices(workspace):
    """The round-3 multi-chip serving flags, through the full CLI seam:
    --spatial_grid NY NX (2-D halo grid) and --data_devices N (batch
    sharding) both produce the same pixels as the plain run."""
    ws = workspace
    artifact = ws / "model.isr"
    assert artifact.exists()
    src = str(ws / "imgs" / "img_3.png")
    rs_main(["--model", str(artifact), "--src", src,
             "--save_dir", str(ws / "plain.png"), "--window_size", "48"])
    rs_main(["--model", str(artifact), "--src", src,
             "--save_dir", str(ws / "grid.png"),
             "--spatial_grid", "2", "2", "--overlap", "8"])
    rs_main(["--model", str(artifact), "--src", src,
             "--save_dir", str(ws / "dd.png"),
             "--window_size", "48", "--data_devices", "8"])
    from PIL import Image

    plain = np.asarray(Image.open(ws / "plain.png"))
    assert plain.shape == (160, 160, 3)
    # data-axis sharding is bitwise identical to the plain tiled run
    np.testing.assert_array_equal(np.asarray(Image.open(ws / "dd.png")), plain)
    assert Image.open(ws / "grid.png").size == (160, 160)


def test_graft_entry_multichip():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g

        fn, args = g.entry()
        import jax

        shape = jax.eval_shape(fn, *args)
        assert shape.shape == (1, 384, 384, 3) and shape.dtype.name == "uint8"
        g.dryrun_multichip(8)
    finally:
        sys.path.pop(0)


def test_train_cli_accepts_every_reference_flag():
    """Flag-surface parity: every flag of reference train.py:141-164 parses."""
    from image_super_resolution_tpu.cli.train import build_parser

    argv = [
        "--resnet", "--scale", "4", "--train_denoise", "--worker", "2",
        "--batch_size", "16", "--work_dir", "./", "--momentum", "0.999",
        "--weight_decay", "0.0", "--lr", "1e-4", "--epochs", "300", "--dml",
        "--mean", "--resume", "--L1_loss", "--rs_deep", "16", "--shape", "96",
        "--save_name", "checkpoint", "--lr2", "0.01", "--seed", "100",
        "--add_rate", "0.2", "--enchant", "--tpu",
    ]
    opt = build_parser().parse_args(argv)
    assert opt.scale == 4 and opt.rs_deep == 16 and opt.enchant


def test_rs_cli_accepts_every_reference_flag():
    """Flag-surface parity with reference rs.py:118-124."""
    from image_super_resolution_tpu.cli.rs import build_parser

    opt = build_parser().parse_args([
        "--model", "m.isr", "--src", "a.png", "--save_dir", "out.png",
        "--window_size", "96", "--batch_size", "1", "--worker", "4",
    ])
    assert opt.window_size == 96 and opt.batch_size == 1


def test_create_json_cli_accepts_reference_flags():
    from image_super_resolution_tpu.cli.create_json import build_parser

    opt = build_parser().parse_args(
        ["--train_dirs", "a", "b", "--val_dirs", "c", "--shape", "96"]
    )
    assert opt.train_dirs == ["a", "b"] and opt.shape == 96


def test_cli_rs_directory_batch(workspace):
    """rs --src DIR processes every image with one loaded model."""
    import numpy as np
    from PIL import Image

    ws = workspace
    artifact = ws / "model.isr"
    assert artifact.exists()  # produced by the pixel-phase test above
    src = ws / "batchdir"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 32, 3), dtype=np.uint8)
        ).save(src / f"im{i}.png")
    outdir = ws / "batch_out"
    rs_main([
        "--model", str(artifact), "--src", str(src), "--save_dir", str(outdir),
        "--window_size", "32", "--overlap", "4", "--batch_size", "2",
    ])
    outs = sorted(outdir.glob("*.png"))
    assert len(outs) == 3
    im = Image.open(outs[0])
    assert im.size == (32 * 2, 40 * 2)


def test_cli_rs_directory_stem_collision(workspace):
    """photo.jpg + photo.png in one folder must not overwrite each other."""
    import numpy as np
    from PIL import Image

    ws = workspace
    artifact = ws / "model.isr"
    src = ws / "collide"
    src.mkdir()
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (40, 32, 3), dtype=np.uint8)
    Image.fromarray(img).save(src / "photo.png")
    Image.fromarray(img).save(src / "photo.jpg")
    outdir = ws / "collide_out"
    rs_main([
        "--model", str(artifact), "--src", str(src), "--save_dir", str(outdir),
        "--window_size", "32", "--overlap", "4", "--batch_size", "2",
    ])
    outs = sorted(p.name for p in outdir.glob("*.png"))
    assert outs == ["photo_jpg.png", "photo_png.png"]


def test_cli_rs_directory_dotted_stems_and_bad_file(workspace):
    """a.v2.jpg / a.v3.jpg must not collide on a.png (suffix REPLACEMENT
    truncates interior dots); one unreadable file must not kill the batch."""
    import numpy as np
    from PIL import Image

    ws = workspace
    artifact = ws / "model.isr"
    src = ws / "dotted"
    src.mkdir()
    rng = np.random.default_rng(2)
    for name in ("a.v2.jpg", "a.v3.jpg"):
        Image.fromarray(
            rng.integers(0, 255, (40, 32, 3), dtype=np.uint8)
        ).save(src / name)
    (src / "broken.png").write_bytes(b"not a png at all")
    outdir = ws / "dotted_out"
    rs_main([
        "--model", str(artifact), "--src", str(src), "--save_dir", str(outdir),
        "--window_size", "32", "--overlap", "4", "--batch_size", "2",
    ])
    outs = sorted(p.name for p in outdir.glob("*.png"))
    assert outs == ["a.v2.png", "a.v3.png"]


def test_cli_gan_resume(workspace):
    """GAN-phase --resume end to end: generator + EMA + D params reload from
    the checkpoint (final checkpoints drop optimizer states, so both
    optimizers restart — reference semantics) and training completes."""
    ws = workspace
    ckpt = ws / "gen_t_1_0.2.ckpt"
    if not ckpt.exists():
        _train_gan(ws)
    train_main([
        "--scale", "2", "--save_name", "t", "--resume",
        "--train_json", str(ws / "train_images.json"),
        "--work_dir", str(ws), *COMMON,
    ])
    _assert_really_trained(ckpt)


def test_cli_orbax_backend_train_resume_export(workspace, tmp_path):
    """--ckpt_backend orbax end to end on the real CLI: the checkpoint is an
    Orbax DIRECTORY with the msgpack payload/lifecycle (non-final epoch keeps
    the optimizer state, resume continues at the right epoch), and export
    consumes the directory without a flag (load_any_checkpoint dispatch)."""
    pytest.importorskip("orbax.checkpoint")
    ws = workspace
    wd = tmp_path / "orbax_wd"
    wd.mkdir()
    train_main([
        "--resnet", "--scale", "2", "--save_name", "ox",
        "--train_json", str(ws / "train_images.json"),
        "--work_dir", str(wd), "--ckpt_backend", "orbax",
        "--epochs", "2", "--batch_size", "2", "--rs_deep", "1",
        "--shape", "48", "--worker", "2", "--no_tensorboard",
    ])
    ckpt = wd / "res_ox_1_0.2.ckpt"
    assert ckpt.is_dir()

    from image_super_resolution_tpu.train.orbax_io import load_checkpoint_orbax

    data = load_checkpoint_orbax(ckpt)
    assert data["meta"]["epoch"] == 1
    assert data["meta"]["step"] > 0
    assert "opt_state" not in data  # final epoch drops optimizer state

    # Resume from the directory: epoch 1 was final, so a 3-epoch run must
    # continue with epoch 2 only (weights-only resume, reference semantics).
    train_main([
        "--resnet", "--scale", "2", "--save_name", "ox", "--resume",
        "--train_json", str(ws / "train_images.json"),
        "--work_dir", str(wd), "--ckpt_backend", "orbax",
        "--epochs", "3", "--batch_size", "2", "--rs_deep", "1",
        "--shape", "48", "--worker", "2", "--no_tensorboard",
    ])
    assert load_checkpoint_orbax(ckpt)["meta"]["epoch"] == 2

    export_main([
        "--checkpoint", str(ckpt),
        "--out", str(wd / "model.isr"), "--rs_deep", "1", "--scale", "2",
    ])
    assert (wd / "model.isr").exists()
    rs_main([
        "--model", str(wd / "model.isr"),
        "--src", str(ws / "imgs" / "img_0.png"),
        "--save_dir", str(wd / "out.png"),
        "--window_size", "48", "--overlap", "8", "--batch_size", "2",
    ])
    assert (wd / "out.png").exists()


def test_cli_fast_family_train_gan_export_rs(workspace, tmp_path):
    """--family fast end to end: pixel pretrain -> GAN phase warm start ->
    export (spec records family+width) -> rs tiled upscale. The fast family
    reuses every phase of the reference training recipe unchanged."""
    ws = workspace
    wd = tmp_path / "fast_wd"
    wd.mkdir()
    common = ["--family", "fast", "--width", "8", "--scale", "2",
              "--save_name", "f", "--train_json", str(ws / "train_images.json"),
              "--work_dir", str(wd), *COMMON]
    train_main(["--resnet", *common])
    _assert_really_trained(wd / "res_f_1_0.2.ckpt")
    train_main(common)  # GAN phase warm-starts from the res checkpoint
    _assert_really_trained(wd / "gen_f_1_0.2.ckpt")

    # no --rs_deep/--width: export must infer depth 1 / width 8 from the
    # checkpoint's param tree instead of using the family preset (14/128)
    export_main([
        "--checkpoint", str(wd / "gen_f_1_0.2.ckpt"),
        "--family", "fast", "--scale", "2",
        "--out", str(wd / "fast.isr"),
    ])
    from image_super_resolution_tpu.models.deploy import load_artifact

    art = load_artifact(wd / "fast.isr")
    assert art.spec.family == "fast" and art.spec.width == 8
    assert art.spec.depth == 1
    rs_main([
        "--model", str(wd / "fast.isr"),
        "--src", str(ws / "imgs" / "img_0.png"),
        "--save_dir", str(wd / "out.png"),
        "--window_size", "48", "--overlap", "8", "--batch_size", "2",
    ])
    assert (wd / "out.png").exists()
    from PIL import Image

    assert Image.open(wd / "out.png").size == (160, 160)


def test_cli_fast_family_rejects_enchant(tmp_path):
    """--family fast + --train_denoise is a real mode (denoise_fast,
    test_cli_denoise_fast_phase); the remaining invalid combination is
    --enchant, which is a reference-topology variant."""
    with pytest.raises(SystemExit, match="enchant"):
        train_main(["--family", "fast", "--enchant", "--resnet",
                    "--work_dir", str(tmp_path)])


def test_cli_gan_warm_start_across_backends(workspace, tmp_path, capsys):
    """The GAN phase must warm-start from a pixel checkpoint written by the
    OTHER backend: loads dispatch on what is on disk (load_any_checkpoint),
    not on --ckpt_backend (which picks the SAVE format only). A loader
    pinned to the save backend silently skipped the warm start and trained
    the GAN from random init."""
    pytest.importorskip("orbax.checkpoint")
    ws = workspace
    wd = tmp_path / "xb_wd"
    wd.mkdir()
    common = ["--scale", "2", "--save_name", "xb",
              "--train_json", str(ws / "train_images.json"),
              "--work_dir", str(wd), *COMMON]
    train_main(["--resnet", *common])  # msgpack pixel checkpoint (a FILE)
    assert (wd / "res_xb_1_0.2.ckpt").is_file()
    capsys.readouterr()
    train_main([*common, "--ckpt_backend", "orbax"])  # GAN, orbax saves
    out = capsys.readouterr().out
    assert "loaded pre-trained generator" in out  # warm start actually ran
    assert (wd / "gen_xb_1_0.2.ckpt").is_dir()  # saved in the NEW backend


def test_cli_tp_rejects_data_devices_sentinel(tmp_path):
    """--data_devices 0 means ALL local devices and must conflict with
    --tp_devices like any explicit count."""
    from image_super_resolution_tpu.cli.rs import run as rs_run

    with pytest.raises(SystemExit, match="mutually exclusive"):
        rs_run(model="whatever.isr", src="x.png", save_dir=str(tmp_path),
               tp_devices=2, data_devices=0)


def test_cli_demo_out_of_box(tmp_path):
    """One-command demo: bundled reference model.pt -> demo.isr -> restored
    test card with PSNR report, then the --src path on a user image."""
    ref_pt = Path("/root/reference/model.pt")
    if not ref_pt.exists():
        pytest.skip("no reference checkout")
    from PIL import Image

    from image_super_resolution_tpu.cli.demo import main as demo_main

    out_dir = tmp_path / "demo"
    demo_main(["--model_pt", str(ref_pt), "--out_dir", str(out_dir),
               "--window_size", "64"])
    assert (out_dir / "demo.isr").exists()
    restored = np.asarray(Image.open(out_dir / "restored.png"))
    clean = np.asarray(Image.open(out_dir / "clean.png"))
    assert restored.shape == clean.shape and restored.dtype == np.uint8

    src = tmp_path / "photo.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (48, 40, 3), dtype=np.uint8)
    ).save(src)
    out = demo_main(["--model_pt", str(ref_pt), "--out_dir", str(out_dir),
                     "--src", str(src), "--window_size", "64"])
    assert out.exists() and out.name == "photo_restored.png"


def test_cli_demo_missing_model_pt(tmp_path, monkeypatch):
    """Without any bundled model.pt the demo fails with a pointed error."""
    from image_super_resolution_tpu.cli import demo

    monkeypatch.setattr(demo, "_SEARCH", (str(tmp_path / "nope.pt"),))
    with pytest.raises(FileNotFoundError, match="--model_pt"):
        demo.main(["--out_dir", str(tmp_path)])


def test_rs_cli_profile_dir_captures_trace(tmp_path):
    """rs.py --profile_dir wraps the whole run in a jax.profiler trace (the
    serving-side counterpart of train.py --profile_dir) and still produces
    the normal output."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from image_super_resolution_tpu.models.deploy import DeploySpec, save_artifact

    spec = DeploySpec(family="fast", depth=1, width=8, scale=2)
    m = spec.build_model()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    isr = tmp_path / "m.isr"
    save_artifact(isr, spec, params)
    src = tmp_path / "in.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (20, 24, 3), np.uint8)
    ).save(src)
    prof = tmp_path / "prof"
    out = rs_main(["--model", str(isr), "--src", str(src),
                   "--save_dir", str(tmp_path / "out.png"),
                   "--window_size", "16", "--overlap", "4",
                   "--profile_dir", str(prof)])
    assert Path(out).exists()
    assert any(prof.rglob("*"))  # a trace was written


def test_cli_denoise_fullres_preset(workspace):
    """--preset denoise_fullres = the x1 fidelity preset (PERF.md round-5 W
    gate): --train_denoise --family fast --downshuffle 1, depth 6 unless
    overridden. Here depth/width are overridden small; the artifact must
    come out downshuffle=1 (full-resolution trunk), x1."""
    ws = workspace
    train_main([
        "--preset", "denoise_fullres", "--width", "8",
        "--save_name", "wf",
        "--train_json", str(ws / "train_images.json"),
        "--work_dir", str(ws), *COMMON,
    ])
    ckpt = ws / "denoise_wf_1_0.2.ckpt"  # COMMON's --rs_deep 1 overrides 6
    assert ckpt.exists()
    _assert_really_trained(ckpt)
    artifact = ws / "denoise_fullres.isr"
    export_main([
        "--checkpoint", str(ckpt), "--out", str(artifact),
        "--family", "denoise_fast",
    ])
    from image_super_resolution_tpu.models.deploy import load_artifact

    spec = load_artifact(artifact).spec
    assert (spec.depth, spec.width, spec.downshuffle) == (1, 8, 1)
    assert spec.output_scale == 1
