"""`cli serve`: persistent daemon — two sequential requests through ONE
process produce byte-identical outputs to the one-shot CLI (VERDICT r4
item 2; the point of the daemon is amortising the per-process jax init +
trace + compile-cache load across requests)."""
import hashlib
import os
import shutil
import subprocess
import sys
import time

import pytest

from magphase_tpu.cli import main as cli_main
from magphase_tpu.serve import request

DATA = "/root/reference/demos/data_48k"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SRV = ("import sys; sys.path.insert(0, {repo!r}); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from magphase_tpu.cli import main; "
        "sys.exit(main(['serve', '--socket', {sock!r}]))")


def _tree_hash(d):
    h = hashlib.sha256()
    for f in sorted(os.listdir(d)):
        with open(os.path.join(d, f), "rb") as fh:
            h.update(f.encode())
            h.update(fh.read())
    return h.hexdigest()


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sock = str(tmp_path_factory.mktemp("srv") / "mp.sock")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-c", _SRV.format(repo=REPO, sock=sock)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True)
    line = proc.stdout.readline()           # blocks until ready
    assert "serving on" in line, line
    yield sock
    try:
        request(sock, shutdown=True, timeout=30)
    except Exception:
        proc.kill()
    proc.wait(timeout=30)


def _gen_args(feats, out):
    return ["generate", "--scp", str(feats / "pred.scp"),
            "--feats-dir", os.path.join(DATA, "params_predicted"),
            "--out-dir", str(out), "--fs", "48000", "--pf-type", "no",
            "--batch-size", "2"]


def test_serve_two_requests_byte_identical(server, tmp_path):
    scp_dir = tmp_path
    (scp_dir / "pred.scp").write_text("hvd_704\nhvd_705\n")

    # one-shot CLI reference (this process, CPU backend via conftest)
    ref = tmp_path / "wavs_ref"
    assert cli_main(_gen_args(scp_dir, ref)) == 0

    # two sequential requests through the ONE daemon process; the second
    # exercises the warm-cache path end to end
    t1 = tmp_path / "wavs_srv1"
    t2 = tmp_path / "wavs_srv2"
    dt = []
    for out in (t1, t2):
        t0 = time.perf_counter()
        assert request(server, _gen_args(scp_dir, out), timeout=900) == 0
        dt.append(time.perf_counter() - t0)

    h = _tree_hash(ref)
    assert _tree_hash(t1) == h
    assert _tree_hash(t2) == h
    # the warm second request must not be grossly slower than the cold
    # first (compile/trace amortised).  Wide slack: this box has 2 CPUs
    # and a loaded suite run measured dt[1] > dt[0] purely from
    # scheduling noise (the real 6.6x warm-request win is measured on
    # TPU, docs/ROUND5.md §2); the load-insensitive contract of this
    # test is the byte-identity above
    assert dt[1] < max(1.5 * dt[0], 20.0), dt


def test_serve_error_reporting(server, tmp_path):
    # unknown scp: the daemon reports a failure rc, stays alive
    rc = request(server, ["generate", "--scp", "/nonexistent.scp",
                          "--feats-dir", "/tmp", "--out-dir",
                          str(tmp_path / "x"), "--fs", "48000"],
                 timeout=120)
    assert rc != 0
    # still serving: bad argv handled via SystemExit, daemon alive
    rc = request(server, ["not-a-command"], timeout=120)
    assert rc != 0


def test_server_flag_requires_socket_path():
    assert cli_main(["generate", "--server"]) == 2


def test_serve_survives_client_disconnects(server, tmp_path):
    """A client that disconnects before reading the reply (timeout,
    Ctrl-C, stray probe) must not kill the daemon: replies are
    best-effort (serve.py:_reply)."""
    import socket

    # garbage request + immediate close, reply never read
    for payload in (b"not json\n", b'{"argv": ["not-a-command"]}\n'):
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(server)
        c.sendall(payload)
        c.close()
    # daemon must still be serving normal requests
    rc = request(server, ["not-a-command"], timeout=120)
    assert rc != 0       # argparse error, but a live, well-formed reply
