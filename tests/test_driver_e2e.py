"""End-to-end driver tests: represent -> checkpoint -> compress, on a tiny
synthetic YUV video (CPU, binned backend). The reference has zero driver
tests (SURVEY.md §4); these guard the full artifact pipeline."""

import numpy as np
import pytest

from gsvc_tpu.drivers import compress as compress_driver
from gsvc_tpu.drivers import represent as represent_driver

# heavyweight tier: interpret-mode Pallas / long fits / full drivers
pytestmark = pytest.mark.slow


def _write_synth_yuv(path, W=48, H=32, F=3):
    rng = np.random.default_rng(0)
    with open(path, "wb") as fo:
        for f in range(F):
            yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
            img = np.zeros((H, W, 3), np.float32)
            for b in range(4):
                cx, cy = rng.uniform(5, W - 5), rng.uniform(5, H - 5)
                s = rng.uniform(3, 8)
                col = rng.uniform(0.3, 1.0, 3)
                g = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
                img += g[..., None] * col
            rgb = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            r, g_, b = (rgb[..., i].astype(np.float32) for i in range(3))
            y = np.clip(16 + (65.738 * r + 129.057 * g_ + 25.064 * b) / 256, 0, 255)
            u = np.clip(128 + (-37.945 * r - 74.494 * g_ + 112.439 * b) / 256, 0, 255)
            v = np.clip(128 + (112.439 * r - 94.154 * g_ - 18.285 * b) / 256, 0, 255)
            fo.write(y.astype(np.uint8).tobytes())
            fo.write(u[::2, ::2].astype(np.uint8).tobytes())
            fo.write(v[::2, ::2].astype(np.uint8).tobytes())
    return path


def test_represent_driver_tile_shards_ragged_height(tmp_path):
    """--tile_shards through the real driver at a NON-tile-divisible
    height (88 = 5.5 tile rows; the 1920x1080 flagship shape,
    miniaturized), on the virtual 8-device mesh."""
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    yuv = _write_synth_yuv(tmp_path / "synth_48x88.yuv", W=48, H=88, F=1)
    ckpt = tmp_path / "ckpt"
    argv = [
        "-d", str(yuv), "--data_name", "synthrag",
        "--width", "48", "--height", "88", "--image_length", "1",
        "--num_points", "40", "--iterations", "12",
        "--kdetect_points", "30", "--kdetect_iterations", "5",
        "--is_rm", "--backend", "binned",
        "--tile_shards", "4",
        "--checkpoint_dir", str(ckpt),
        "--savdir", "result", "--savdir_m", "models",
    ]
    represent_driver.main(argv)
    run = "GaussianVideo_12_40"
    out_dir = ckpt / "result" / "synthrag" / run
    assert (out_dir / "train.txt").exists()
    txt = (out_dir / "train.txt").read_text()
    assert "PSNR" in txt
    state = np.load(ckpt / "models" / "synthrag" / run / "gmodels_state_dict.npz")
    assert "frame_1/_xyz" in state


def test_represent_then_compress_e2e(tmp_path):
    yuv = _write_synth_yuv(tmp_path / "synth_48x32.yuv")
    ckpt = tmp_path / "ckpt"
    argv = [
        "-d", str(yuv), "--data_name", "synth",
        "--width", "48", "--height", "32", "--image_length", "3",
        "--num_points", "40", "--iterations", "30",
        "--kdetect_points", "30", "--kdetect_iterations", "10",
        "--is_rm", "--backend", "binned",
        "--checkpoint_dir", str(ckpt),
        "--savdir", "result", "--savdir_m", "models",
    ]
    represent_driver.main(argv)

    run = "GaussianVideo_30_40"
    out_dir = ckpt / "result" / "synth" / run
    model_dir = ckpt / "models" / "synth" / run
    assert (out_dir / "train.txt").exists()
    assert (ckpt / "result" / "synth" / "K_frames.txt").exists()
    ckpt_file = model_dir / "gmodels_state_dict.npz"
    assert ckpt_file.exists()
    state = np.load(ckpt_file)
    assert "frame_1/_xyz" in state
    k_frames = [
        int(line)
        for line in (ckpt / "result" / "synth" / "K_frames.txt")
        .read_text()
        .splitlines()
    ]
    assert k_frames[0] == 1

    train_lines = (out_dir / "train.txt").read_text()
    assert "PSNR" in train_lines or "psnr" in train_lines.lower()

    cargv = [
        "-d", str(yuv), "--data_name", "synth",
        "--width", "48", "--height", "32", "--image_length", "3",
        "--num_points", "40", "--iterations", "20",
        "--model_path", str(ckpt_file),
        "--backend", "binned",
        "--checkpoint_dir", str(ckpt),
        "--k_frames_dir", str(ckpt),
        "--savdir", "result", "--savdir_m", "cmodels",
    ]
    compress_driver.main(cargv)
    cout = ckpt / "result" / "synth" / "GaussianVideo_20_40"
    assert (cout / "train.txt").exists()
    ctext = (cout / "train.txt").read_text()
    assert "bpp" in ctext.lower()

    # full decode round-trip from the written bitstream: a K-frame must
    # reconstruct a valid image purely from the coded bytes
    from gsvc_tpu.compress.bitstream import decode_frame, render_decoded
    from gsvc_tpu.config import FrameConfig

    bs = ckpt / "cmodels" / "synth" / "GaussianVideo_20_40" / "bitstream"
    blob = (bs / "frame_1.gsvc").read_bytes()
    means, chol, colors = decode_frame(blob)
    cfg = FrameConfig(H=32, W=48, num_points=means.shape[0],
                      max_num_points=means.shape[0], iterations=1,
                      backend="binned")
    img = np.asarray(render_decoded(means, chol, colors, cfg))
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all() and img.std() > 0.01

    # decoder CLI: whole bitstream dir (K + P frames) -> frames + report
    from gsvc_tpu import decode as decode_cli

    dec_out = tmp_path / "decoded"
    rc = decode_cli.main([
        "--bitstream", str(bs), "--height", "32", "--width", "48",
        "--model_path", str(ckpt_file),
        "--k_frames", str(ckpt / "result" / "synth" / "K_frames.txt"),
        "-d", str(yuv), "--out", str(dec_out),
    ])
    assert rc == 0
    assert (dec_out / "decoded.rgb").stat().st_size == 3 * 32 * 48 * 3
    report = (dec_out / "decode.txt").read_text()
    assert "PSNR:" in report and "Frame_3" in report
    assert (dec_out / "frame_1.png").exists()
    # decoded-from-bytes PSNR must MATCH the encoder-side eval PSNR the
    # compress driver reported (regression guard: an undersized decode
    # intersection budget silently dropped splats for a ~25 dB loss)
    import re as _re

    enc_psnr = {
        int(m.group(1)): float(m.group(2))
        for m in _re.finditer(r"Frame_(\d+):.*?PSNR:([\d.]+)", ctext)
    }
    dec_psnr = {
        int(m.group(1)): float(m.group(2))
        for m in _re.finditer(r"Frame_(\d+):.*?PSNR:([\d.]+)", report)
    }
    assert set(dec_psnr) == set(enc_psnr)
    for f in enc_psnr:
        assert abs(dec_psnr[f] - enc_psnr[f]) < 0.1, (
            f, dec_psnr[f], enc_psnr[f]
        )
    # P-frames without side info must fail loudly, not decode garbage
    with pytest.raises(SystemExit):
        decode_cli.main([
            "--bitstream", str(bs), "--height", "32", "--width", "48",
            "--out", str(tmp_path / "d2"),
        ])
