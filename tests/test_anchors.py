"""External anchor hooks (upcc_tpu/eval/anchors.py): golden tests of the
constructed command lines and of canned-output parsing, with subprocess
monkeypatched — no MPEG binaries exist in this environment (VERDICT r2
item 8: untested subprocess code is unverified code).

Reference command shapes: /root/reference/utils.py:505-661 (tmc3/tmc2/
IT-DL-PCC) and :270-322 (PCQM binary)."""

import os
import subprocess
import types

import numpy as np
import pytest

from upcc_tpu.data.ply import write_ply
from upcc_tpu.data.synthetic import surface_cloud
from upcc_tpu.eval import anchors


@pytest.fixture
def cloud():
    rng = np.random.default_rng(0)
    xyz, rgb = surface_cloud(rng, extent=64, n_target=800)
    return np.concatenate([xyz.astype(np.float64), rgb], axis=1)


def test_gpcc_command_and_parse(monkeypatch, tmp_path, cloud):
    calls = []

    def fake_run(cmd, check=False, capture_output=False, **kw):
        calls.append(cmd)
        opts = {c.split("=", 1)[0]: c.split("=", 1)[1]
                for c in cmd if "=" in c}
        if opts.get("--mode") == "0":
            with open(opts["--compressedStreamPath"], "wb") as f:
                f.write(b"\x00" * 100)  # 100-byte stream -> known bpp
        else:
            rec = cloud.copy()
            write_ply(opts["--reconstructedDataPath"], rec[:, :3],
                      rec[:, 3:6])
        return types.SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(anchors, "has_gpcc", lambda: True)
    monkeypatch.setattr(anchors.subprocess, "run", fake_run)
    out, bpp, t_enc, t_dec = anchors.compress_gpcc(
        cloud, q_a=34, q_g=0.75, tmp_dir=str(tmp_path))

    enc, dec = calls
    assert enc[0] == anchors.GPCC_BIN and "--mode=0" in enc
    assert "--positionQuantizationScale=0.75" in enc
    assert "--qp=34" in enc and "--transformType=0" in enc
    assert "--mode=1" in dec and "--outputBinaryPly=0" in dec
    assert out.shape == (len(cloud), 6)
    assert abs(bpp - 100 * 8 / len(cloud)) < 1e-9
    assert t_enc >= 0 and t_dec >= 0


def test_pcqm_binary_parse(monkeypatch, tmp_path, cloud):
    captured = {}

    def fake_run(cmd, capture_output=False, text=False, **kw):
        captured["cmd"] = cmd
        return types.SimpleNamespace(returncode=0,
                                     stdout="...\nPCQM : 0.004625\n",
                                     stderr="")

    monkeypatch.setattr(anchors.os.path, "exists",
                        lambda p: True if p == anchors.PCQM_BIN
                        else os.path.lexists(p))
    monkeypatch.setattr(anchors.subprocess, "run", fake_run)
    val, src = anchors.pcqm(cloud, cloud, tmp_dir=str(tmp_path))
    assert src == "binary"
    assert abs(val - 0.004625) < 1e-12
    cmd = captured["cmd"]
    assert cmd[0] == anchors.PCQM_BIN and "-fq" in cmd


def test_pcqm_falls_back_to_native(monkeypatch, cloud):
    monkeypatch.setattr(anchors, "PCQM_BIN", "/nonexistent/PCQM")
    val, src = anchors.pcqm(cloud, cloud, max_points=500)
    assert src == "native"
    assert val < 1e-9  # identical clouds


def test_vpcc_command(monkeypatch, tmp_path, cloud):
    calls = []

    def fake_run(cmd, check=False, capture_output=False, **kw):
        calls.append(cmd)
        opts = {c.split("=", 1)[0]: c.split("=", 1)[1]
                for c in cmd if "=" in c}
        with open(opts["--compressedStreamPath"], "wb") as f:
            f.write(b"\x00" * 50)
        return types.SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(anchors.shutil, "which", lambda p: p)
    monkeypatch.setattr(anchors.subprocess, "run", fake_run)
    binf, bpp, t = anchors.compress_vpcc(cloud, rate_preset=3,
                                         tmp_dir=str(tmp_path))
    (cmd,) = calls
    assert cmd[0] == anchors.VPCC_BIN and "--rateIndex=3" in cmd
    assert abs(bpp - 50 * 8 / len(cloud)) < 1e-9
    assert os.path.exists(binf)


def test_vpcc_missing_binary_raises(monkeypatch, cloud):
    monkeypatch.setattr(anchors.shutil, "which", lambda p: None)
    monkeypatch.setattr(anchors, "VPCC_BIN", "/nonexistent/tmc2")
    with pytest.raises(FileNotFoundError):
        anchors.compress_vpcc(cloud)


def test_itdlpcc_command(monkeypatch, tmp_path, cloud):
    fake_repo = tmp_path / "itdlpcc"
    (fake_repo / "src").mkdir(parents=True)
    (fake_repo / "src" / "compress.py").write_text("")
    calls = []

    def fake_run(cmd, check=False, capture_output=False, **kw):
        calls.append(cmd)
        out_dir = cmd[3]
        with open(os.path.join(out_dir, "stream.gz"), "wb") as f:
            f.write(b"\x00" * 25)
        return types.SimpleNamespace(returncode=0, stdout="", stderr="")

    monkeypatch.setattr(anchors, "ITDLPCC_DIR", str(fake_repo))
    monkeypatch.setattr(anchors.subprocess, "run", fake_run)
    work = tmp_path / "work"
    work.mkdir()
    outs, bpp, t = anchors.compress_itdlpcc(cloud, rate=2, with_color=True,
                                            tmp_dir=str(work))
    (cmd,) = calls
    assert cmd[1].endswith("compress.py")
    assert cmd[-1].endswith(os.path.join("models", "joint", "R2"))
    assert len(outs) == 1 and outs[0].endswith(".gz")
    assert abs(bpp - 25 * 8 / len(cloud)) < 1e-9


def test_evaluate_external_pcqm_mode(monkeypatch, cloud):
    """evaluate.py --pcqm external: routes through the anchors hook and
    falls back to native when no binary is installed."""
    import evaluate
    monkeypatch.setattr(anchors, "PCQM_BIN", "/nonexistent/PCQM")
    fn = evaluate.make_pcqm("external", pcqm_max_points=500)
    assert fn(cloud, cloud) < 1e-9
    fn_native = evaluate.make_pcqm("native", pcqm_max_points=500)
    assert fn_native(cloud, cloud) < 1e-9
