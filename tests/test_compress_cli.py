"""File-level CLI round-trip: PLY -> .upcc -> PLY via compress.py.

Exercises upcc_tpu.codec.io.load_codec (the shared experiment loader used
by evaluate.py and the CLI) plus the streaming codec path end to end on a
tiny model, including the no-weights template fallback.
"""

import os
import sys

import numpy as np
import pytest
import yaml

# repo root on sys.path BEFORE any repo import: `import compress` (and
# `import upcc_tpu` when the package isn't installed) both rely on it.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import upcc_tpu  # noqa: F401,E402

TINY_MODEL = {
    "entropy_model": {"C_bottleneck": 16, "C_hyper_bottleneck": 24,
                      "quantization_mode": "ste", "inverse_rescaling": True,
                      "quantization_offset": True},
    "g_a": {"C_in": 4, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
    "g_s": {"C_out": 3, "N1": 16, "N2": 16, "N3": 16, "N4": 16},
}


@pytest.fixture(scope="module")
def exp_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("exp")
    (d / "config.yaml").write_text(yaml.safe_dump(
        {"model": TINY_MODEL, "batch_size": 2}))
    return str(d)


def test_cli_rejects_duplicate_stems(tmp_path):
    """Two inputs sharing a basename stem must error, not silently
    overwrite each other's output (ADVICE r2)."""
    import compress
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    (d1 / "frame.ply").write_bytes(b"")
    (d2 / "frame.ply").write_bytes(b"")
    with pytest.raises(SystemExit):
        compress.main(["encode", str(d1 / "frame.ply"), str(d2 / "frame.ply"),
                       str(tmp_path / "out")])


def test_cli_roundtrip(exp_dir, tmp_path):
    from upcc_tpu.data.ply import read_ply, write_ply
    from upcc_tpu.data.synthetic import surface_cloud

    rng = np.random.default_rng(7)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1500)
    src = str(tmp_path / "in.ply")
    write_ply(src, xyz, rgb)

    import compress

    bit = str(tmp_path / "out.upcc")
    compress.main(["encode", src, bit, "--experiment", exp_dir,
                   "--q", "0.5", "0.5", "--block_size", "64"])
    assert os.path.getsize(bit) > 0

    rec = str(tmp_path / "rec.ply")
    compress.main(["decode", bit, rec, "--experiment", exp_dir])
    rx, rc = read_ply(rec)
    assert len(rx) > 0
    assert rx.min() >= 0 and rx.max() < 64
    assert rc is not None and rc.shape == rx.shape


def test_cli_ladder_simulcast(exp_dir, tmp_path):
    """--ladder writes one .rN.upcc per rung, each byte-identical to the
    corresponding single --q encode."""
    from upcc_tpu.data.ply import write_ply
    from upcc_tpu.data.synthetic import surface_cloud

    import compress

    rng = np.random.default_rng(9)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1200)
    src = str(tmp_path / "in.ply")
    write_ply(src, xyz, rgb)

    out = str(tmp_path / "lad.upcc")
    compress.main(["encode", src, out, "--experiment", exp_dir,
                   "--block_size", "64",
                   "--ladder", "0.2", "0.2", "0.8", "0.8"])
    singles = []
    for i, q in enumerate([(0.2, 0.2), (0.8, 0.8)]):
        p = str(tmp_path / f"s{i}.upcc")
        compress.main(["encode", src, p, "--experiment", exp_dir,
                       "--block_size", "64", "--q", str(q[0]), str(q[1])])
        singles.append(open(p, "rb").read())
    for i in range(2):
        rung = open(str(tmp_path / f"lad.r{i}.upcc"), "rb").read()
        assert rung == singles[i]

    with pytest.raises(SystemExit):  # odd float count
        compress.main(["encode", src, out, "--experiment", exp_dir,
                       "--ladder", "0.2", "0.2", "0.8"])
    with pytest.raises(SystemExit):  # decode mode
        compress.main(["decode", out, str(tmp_path / "x.ply"),
                       "--experiment", exp_dir, "--ladder", "0.5", "0.5"])


def test_cli_color_affine(exp_dir, tmp_path):
    """--color_affine attaches the 48-byte refit; the decoded PLY matches
    the refit stream (and --ladder combination is rejected)."""
    from upcc_tpu.data.ply import read_ply, write_ply
    from upcc_tpu.data.synthetic import surface_cloud

    import compress

    rng = np.random.default_rng(11)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1200)
    src = str(tmp_path / "in.ply")
    write_ply(src, xyz, rgb)

    plain = str(tmp_path / "plain.upcc")
    fitted = str(tmp_path / "fit.upcc")
    compress.main(["encode", src, plain, "--experiment", exp_dir,
                   "--q", "0.5", "0.5", "--block_size", "64"])
    compress.main(["encode", src, fitted, "--experiment", exp_dir,
                   "--q", "0.5", "0.5", "--block_size", "64",
                   "--color_affine"])
    dp, df = os.path.getsize(plain), os.path.getsize(fitted)
    assert df in (dp, dp + 48)  # identity fit signals nothing

    rec = str(tmp_path / "rec.ply")
    compress.main(["decode", fitted, rec, "--experiment", exp_dir])
    rx, rc = read_ply(rec)
    assert len(rx) > 0 and rc is not None

    with pytest.raises(SystemExit):
        compress.main(["encode", src, fitted, "--experiment", exp_dir,
                       "--ladder", "0.5", "0.5", "--color_affine"])


@pytest.mark.slow
def test_cli_color_resid(exp_dir, tmp_path):
    """--color_resid LAM attaches the residual enhancement layer; the
    decoded PLY carries the corrected colors bit-exactly."""
    from upcc_tpu.data.ply import read_ply, write_ply
    from upcc_tpu.data.synthetic import surface_cloud

    import compress

    rng = np.random.default_rng(12)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=1200)
    src = str(tmp_path / "in.ply")
    write_ply(src, xyz, rgb)

    plain = str(tmp_path / "plain.upcc")
    enh = str(tmp_path / "enh.upcc")
    compress.main(["encode", src, plain, "--experiment", exp_dir,
                   "--q", "1.0", "1.0", "--block_size", "64"])
    compress.main(["encode", src, enh, "--experiment", exp_dir,
                   "--q", "1.0", "1.0", "--block_size", "64",
                   "--color_resid", "12800"])
    # the untrained fixture model's colors are far off: the layer engages
    assert os.path.getsize(enh) > os.path.getsize(plain)

    rec = str(tmp_path / "rec.ply")
    compress.main(["decode", enh, rec, "--experiment", exp_dir])
    rx, rc = read_ply(rec)
    assert len(rx) > 0 and rc is not None
    # corrected colors are closer to the source than the plain stream's
    from upcc_tpu.codec.io import load_codec
    from upcc_tpu.eval.metrics import pc_metrics
    codec, _ = load_codec(exp_dir)
    rec_plain = codec.decompress(open(plain, "rb").read())
    pc = np.concatenate([xyz.astype(np.float64), rgb], axis=1)
    rec_enh = np.concatenate([rx.astype(np.float64), rc], axis=1)
    m0 = pc_metrics(pc, rec_plain, 64, with_d2=False)
    m1 = pc_metrics(pc, rec_enh, 64, with_d2=False)
    assert m1["sym_y_psnr"] > m0["sym_y_psnr"]

    with pytest.raises(SystemExit):
        compress.main(["encode", src, enh, "--experiment", exp_dir,
                       "--ladder", "0.5", "0.5", "--color_resid", "100"])
