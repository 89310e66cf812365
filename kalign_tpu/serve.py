"""Persistent alignment server: keep one warm JAX process serving
many CLI invocations.

Why: a JAX process pays per-program costs on first use — client-side
compilation, and (on tunneled/remote device setups) a first-execution
program load that can cost seconds per distinct kernel shape.  Within
one process every later alignment is warm (16384x150 runs in ~39 s
warm vs ~17 min for a fully cold process on the dev tunnel).  The
reference is a subprocess-per-invocation CLI; a TPU-native production
deployment instead keeps ONE resident process and streams work through
it — this module is that resident process.

Protocol (newline-delimited JSON over a unix socket):
  request : {"argv": [...kalign CLI args...], "cwd": "/client/cwd"}
  response: {"rc": int, "error": str|null, "wall_s": float}
The server runs the standard CLI entry in-process, so every engine,
flag and output path behaves exactly as the one-shot CLI.  Requests
are serialized (single-aligner contract) and each one runs with the
process cwd switched to the client's cwd, so relative -i/-o paths
resolve exactly as they would in a one-shot invocation.

Usage:
  python -m kalign_tpu.serve --socket /tmp/kalign.sock   # server
  python -m kalign_tpu.cli --server=/tmp/kalign.sock -i in.fa -o out.afa
"""

import argparse
import json
import os
import socket
import socketserver
import sys
import threading
import time


DEFAULT_SOCKET = "/tmp/kalign_tpu.sock"

# One request at a time: the engine is a single-aligner, and the
# per-request chdir to the client's cwd is process-global state.
_RUN_LOCK = threading.Lock()


def _handle_line(line: str) -> dict:
    try:
        req = json.loads(line)
        argv = req["argv"]
        cwd = req.get("cwd")
    except Exception as e:
        return {"rc": 2, "error": f"bad request: {e}", "wall_s": 0.0}
    from kalign_tpu import cli
    t0 = time.time()
    with _RUN_LOCK:
        prev_cwd = os.getcwd()
        try:
            if cwd:
                os.chdir(cwd)
            rc = cli.main(argv)
            return {"rc": int(rc), "error": None,
                    "wall_s": round(time.time() - t0, 3)}
        except SystemExit as e:
            if e.code is None or isinstance(e.code, int):
                rc, err = int(e.code or 0), None
            else:
                rc, err = 1, str(e.code)
            return {"rc": rc, "error": err,
                    "wall_s": round(time.time() - t0, 3)}
        except Exception as e:
            return {"rc": 1, "error": f"{type(e).__name__}: {e}",
                    "wall_s": round(time.time() - t0, 3)}
        finally:
            os.chdir(prev_cwd)


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        for raw in self.rfile:
            line = raw.decode().strip()
            if not line:
                continue
            if line == '{"cmd": "shutdown"}':
                self.wfile.write(b'{"rc": 0, "error": null}\n')
                self.wfile.flush()
                # threading server: shutdown must come from another
                # thread to avoid deadlock
                threading.Thread(target=self.server.shutdown,
                                 daemon=True).start()
                return
            resp = _handle_line(line)
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()


def serve(sock_path: str = DEFAULT_SOCKET, warmup: bool = True,
          ready_cb=None) -> None:
    if os.path.exists(sock_path):
        os.unlink(sock_path)
    if warmup:
        try:
            from kalign_tpu.warmup import warmup as do_warmup
            do_warmup(engines=("tpu-fast",), sizes=[(16, 120)], quiet=True)
        except Exception:
            pass
    srv = socketserver.ThreadingUnixStreamServer(sock_path, _Handler)
    print(f"kalign_tpu server listening on {sock_path}", file=sys.stderr)
    if ready_cb is not None:
        ready_cb()
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
        if os.path.exists(sock_path):
            os.unlink(sock_path)


def request(sock_path: str, argv) -> dict:
    """Client side: send one CLI invocation to a running server."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(sock_path)
        s.sendall((json.dumps({"argv": list(argv),
                               "cwd": os.getcwd()}) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf.decode())


def shutdown(sock_path: str) -> None:
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(sock_path)
        s.sendall(b'{"cmd": "shutdown"}\n')
        s.recv(4096)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="persistent warm kalign_tpu alignment server")
    ap.add_argument("--socket", default=DEFAULT_SOCKET)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args(argv)
    serve(args.socket, warmup=not args.no_warmup)
    return 0


if __name__ == "__main__":
    sys.exit(main())
