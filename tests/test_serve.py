"""Tests for the persistent warm alignment server (kalign_tpu/serve.py):
a real unix-socket server process handles CLI invocations in-process
and produces byte-identical output to the one-shot CLI."""

import os
import subprocess
import sys
import time

from conftest import DATA

_SERVER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
from kalign_tpu.serve import serve
serve(sys.argv[1], warmup=False)
"""


def _wait_socket(path, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(path):
            return True
        time.sleep(0.1)
    return False


def test_server_roundtrip_matches_cli(tmp_path):
    sock = str(tmp_path / "kalign.sock")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-c", _SERVER, sock], env=env,
        cwd=os.path.dirname(DATA) + "/..",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        assert _wait_socket(sock), "server socket never appeared"
        inp = os.path.join(DATA, "BB11001.tfa")
        out_srv = str(tmp_path / "srv.afa")
        out_cli = str(tmp_path / "cli.afa")

        from kalign_tpu.serve import request, shutdown
        resp = request(sock, ["-i", inp, "-o", out_srv, "-q"])
        assert resp["rc"] == 0 and not resp["error"], resp

        from kalign_tpu import cli
        assert cli.main(["-i", inp, "-o", out_cli, "-q"]) == 0
        assert open(out_srv).read() == open(out_cli).read()

        # second request reuses the warm process
        out2 = str(tmp_path / "srv2.afa")
        resp = request(sock, ["-i", inp, "-o", out2, "-q"])
        assert resp["rc"] == 0
        assert open(out2).read() == open(out_cli).read()

        # CLI --server front-end (explicit socket is =-form only)
        out3 = str(tmp_path / "srv3.afa")
        assert cli.main([f"--server={sock}", "-i", inp, "-o", out3,
                         "-q"]) == 0
        assert open(out3).read() == open(out_cli).read()

        # relative paths resolve against the CLIENT cwd, not the
        # server's (the server process runs in a different directory)
        os.makedirs(tmp_path / "sub", exist_ok=True)
        cwd0 = os.getcwd()
        os.chdir(tmp_path / "sub")
        try:
            assert cli.main([f"--server={sock}", "-i", inp,
                             "-o", "rel.afa", "-q"]) == 0
            assert open(tmp_path / "sub" / "rel.afa").read() \
                == open(out_cli).read()
        finally:
            os.chdir(cwd0)

        shutdown(sock)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()


def test_server_reports_errors(tmp_path):
    sock = str(tmp_path / "kalign.sock")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-c", _SERVER, sock], env=env,
        cwd=os.path.dirname(DATA) + "/..",
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        assert _wait_socket(sock)
        from kalign_tpu.serve import request, shutdown
        resp = request(sock, ["-i", "/nonexistent/xx.fa", "-o",
                              str(tmp_path / "y.afa"), "-q"])
        assert resp["rc"] != 0 or resp["error"]
        shutdown(sock)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()


def test_server_start_skips_spawn_when_alive(tmp_path, monkeypatch):
    """--server-start must not spawn a second daemon when the socket
    already answers."""
    import socket as socklib
    import subprocess as sp
    from kalign_tpu import cli

    sock = str(tmp_path / "alive.sock")
    srv = socklib.socket(socklib.AF_UNIX, socklib.SOCK_STREAM)
    srv.bind(sock)
    srv.listen(1)
    try:
        def boom(*a, **k):
            raise AssertionError("spawned despite live socket")
        monkeypatch.setattr(sp, "Popen", boom)
        cli._ensure_server(sock, timeout=5)
    finally:
        srv.close()


def test_server_start_times_out_cleanly(tmp_path, monkeypatch):
    import subprocess as sp
    import pytest
    from kalign_tpu import cli

    sock = str(tmp_path / "never.sock")
    spawned = {}

    class _P:
        def __init__(self, *a, **k):
            spawned["argv"] = a[0]
    monkeypatch.setattr(sp, "Popen", _P)
    with pytest.raises(SystemExit):
        cli._ensure_server(sock, timeout=2)
    assert "kalign_tpu.serve" in " ".join(spawned["argv"])


def test_server_flag_stripping(tmp_path, monkeypatch):
    """All --server* spellings must be stripped from the forwarded
    argv; the alignment flags must survive."""
    import kalign_tpu.serve as S
    from kalign_tpu import cli

    seen = {}

    def fake_request(sock, argv):
        seen["sock"] = sock
        seen["argv"] = list(argv)
        return {"rc": 0, "error": ""}

    monkeypatch.setattr(S, "request", fake_request)
    monkeypatch.setattr(cli, "_ensure_server", lambda s, timeout=900: None)
    for argv, want_sock in [
            (["--server=/tmp/y.sock", "-i", "in.fa", "-o", "o.afa"],
             "/tmp/y.sock"),
            (["-i", "in.fa", "--server-start", "--server=/tmp/z.sock",
              "-o", "o.afa"], "/tmp/z.sock"),
    ]:
        assert cli.main(argv) == 0
        assert seen["sock"] == want_sock
        assert seen["argv"] == ["-i", "in.fa", "-o", "o.afa"], seen["argv"]

    # bare --server never consumes a following token: `--server in.fa`
    # means default socket + in.fa as a positional input file
    from kalign_tpu.serve import DEFAULT_SOCKET
    assert cli.main(["--server", "in.fa", "-o", "o.afa"]) == 0
    assert seen["sock"] == DEFAULT_SOCKET
    assert seen["argv"] == ["in.fa", "-o", "o.afa"], seen["argv"]


def test_warmup_seeds_cache(tmp_path, monkeypatch):
    """python -m kalign_tpu.warmup must run the engines over its size
    grid without error (CPU backend) and leave the compile cache
    enabled; failures in one size must not abort the rest."""
    import jax
    from kalign_tpu import warmup as W

    monkeypatch.setenv("KALIGN_TPU_COMPILE_CACHE", str(tmp_path / "xla"))
    W.warmup(engines=("tpu-fast",), sizes=[(8, 60)], consistency=False,
             quiet=True)
    assert jax.config.jax_compilation_cache_dir


def test_warmup_tree_programs_compile(monkeypatch, tmp_path):
    """AOT tree-program seeding (fused k-means) must lower+compile the
    requested padded sizes without executing the recursion."""
    monkeypatch.setenv("KALIGN_TPU_COMPILE_CACHE", str(tmp_path / "xla"))
    from kalign_tpu import warmup as W
    W.warmup_tree_programs((2048,), quiet=True)
