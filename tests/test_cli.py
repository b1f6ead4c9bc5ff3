"""CLI tests: execute/prove/verify round-trip plus new/build scaffolding
(main.zig:21-295 behaviors)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd=None):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "zigz_tpu.cli", *args],
        capture_output=True,
        text=True,
        cwd=cwd or REPO,
        env=env,
        timeout=120,
    )


def _write_guest(tmp_path):
    sys.path.insert(0, REPO)
    from zigz_tpu.guest.programs import fibonacci_guest

    path = tmp_path / "fib.elf"
    path.write_bytes(fibonacci_guest())
    return str(path)


def test_usage_banner():
    r = run_cli([])
    assert r.returncode == 0
    assert "execute" in r.stdout and "prove" in r.stdout


def test_execute_elf(tmp_path):
    guest = _write_guest(tmp_path)
    r = run_cli(["execute", guest])
    assert r.returncode == 0, r.stderr
    assert "execute:" in r.stdout


def test_execute_raw_bin(tmp_path):
    path = tmp_path / "prog.bin"
    path.write_bytes(bytes([0x13, 0x00, 0x00, 0x00] * 4))
    r = run_cli(["execute", str(path), "--entry", "0x1000", "--max-steps", "10"])
    assert r.returncode == 0, r.stderr
    assert "4 steps" in r.stdout


def test_prove_verify_roundtrip(tmp_path):
    guest = _write_guest(tmp_path)
    proof_path = str(tmp_path / "proof.bin")
    r = run_cli(["prove", guest, "--input", "10", "--out", proof_path])
    assert r.returncode == 0, r.stderr
    assert "prove:" in r.stdout
    assert "outputs: [55, 89]" in r.stdout  # fib(10), fib(11)
    assert os.path.exists(proof_path)

    r2 = run_cli(["verify", proof_path, guest])
    assert r2.returncode == 0, r2.stderr
    assert "Accept" in r2.stdout


def test_verify_wrong_program_fails(tmp_path):
    guest = _write_guest(tmp_path)
    proof_path = str(tmp_path / "proof.bin")
    run_cli(["prove", guest, "--input", "3", "--out", proof_path])
    other = tmp_path / "other.bin"
    other.write_bytes(bytes([0x13, 0x00, 0x00, 0x00] * 2))
    r = run_cli(["verify", proof_path, str(other)])
    assert r.returncode != 0


def test_new_and_build(tmp_path):
    r = run_cli(["new", "myproj"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "myproj" / "src" / "main.py").exists()

    r2 = run_cli(["build", "myproj"], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr
    elf_path = tmp_path / "myproj" / "out" / "program"
    assert elf_path.exists()

    # And the produced guest runs: doubles its input.
    r3 = run_cli(["prove", str(elf_path), "--input", "21"])
    assert "outputs: [42]" in r3.stdout


def test_prove_supervised(tmp_path):
    """--supervise routes through the recovery supervisor and produces a
    proof the normal verify path accepts."""
    guest = _write_guest(tmp_path)
    out = str(tmp_path / "proof.bin")
    r = run_cli(["prove", guest, "--input", "10", "--out", out, "--supervise"])
    assert r.returncode == 0, r.stderr
    assert "supervised, restarts=0" in r.stdout
    r2 = run_cli(["verify", out, guest])
    assert r2.returncode == 0 and "Accept" in r2.stdout
