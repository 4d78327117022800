#!/usr/bin/env python
"""Tunnel behavior experiments for E2E pipeline design (round 4).

Each mode runs in a fresh process (the axon client's sync/async mode is
process-global).  Findings feed the sync-pipelined schedules in
parallel/analysis_batch.py and bench.py.

Modes:
  duplex    — concurrent upload/download/compute from separate threads:
              does the tunnel multiplex streams (full duplex) or
              serialise them?
  dtypes    — download MB/s by dtype/size: is the downstream leg
              bytes-limited or per-transfer fixed cost?
  chunks    — one big vs many small downloads.
"""
import json
import sys
import threading
import time

import numpy as np


def _flip_sync(jax, dev):
    probe = jax.device_put(np.zeros(8, np.float32), dev)
    _ = np.asarray(jax.device_get(probe))


def mode_duplex():
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    _flip_sync(jax, dev)

    MB = 8
    up_arr = np.zeros(MB * 1024 * 1024 // 2, np.int16)
    mk = jax.jit(lambda s: jnp.zeros((MB * 1024 * 1024 // 2,),
                                     jnp.int16) + s)
    down_bufs = [mk(jnp.int16(i)) for i in range(6)]
    jax.block_until_ready(down_bufs)
    # compute kernel ~50 ms of real device work
    w = jax.device_put(np.random.RandomState(0).randn(2048, 2048)
                       .astype(np.float32), dev)

    @jax.jit
    def burn(x):
        def body(c, _):
            return jnp.tanh(c @ x), None
        c, _ = jax.lax.scan(body, x, None, length=8)
        return jnp.sum(c)

    _ = float(jax.device_get(burn(w)))

    def t_up(n=3):
        t0 = time.perf_counter()
        for _ in range(n):
            b = jax.device_put(up_arr, dev)
            b.block_until_ready()
            del b
        return time.perf_counter() - t0

    def t_down(bufs):
        t0 = time.perf_counter()
        for b in bufs:
            _ = np.asarray(jax.device_get(b))
        return time.perf_counter() - t0

    def t_burn(n=3):
        t0 = time.perf_counter()
        for _ in range(n):
            _ = float(jax.device_get(burn(w)))
        return time.perf_counter() - t0

    out = {}
    out["up_serial_s"] = t_up()
    out["down_serial_s"] = t_down(down_bufs[:3])
    out["burn_serial_s"] = t_burn()

    # concurrent up + down
    res = {}
    th1 = threading.Thread(target=lambda: res.__setitem__("u", t_up()))
    th2 = threading.Thread(
        target=lambda: res.__setitem__("d", t_down(down_bufs[3:])))
    t0 = time.perf_counter()
    th1.start(); th2.start(); th1.join(); th2.join()
    out["updown_wall_s"] = time.perf_counter() - t0
    out["updown_up_s"] = res["u"]
    out["updown_down_s"] = res["d"]

    # concurrent up + compute
    res = {}
    th1 = threading.Thread(target=lambda: res.__setitem__("u", t_up()))
    th2 = threading.Thread(target=lambda: res.__setitem__("b", t_burn()))
    t0 = time.perf_counter()
    th1.start(); th2.start(); th1.join(); th2.join()
    out["upburn_wall_s"] = time.perf_counter() - t0
    out["upburn_up_s"] = res["u"]
    out["upburn_burn_s"] = res["b"]
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


def mode_dtypes():
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    _flip_sync(jax, dev)
    out = {}
    for name, dtype, mb in [("u8_8MB", jnp.uint8, 8),
                            ("i16_8MB", jnp.int16, 8),
                            ("f16_8MB", jnp.float16, 8),
                            ("f32_8MB", jnp.float32, 8),
                            ("f16_2MB", jnp.float16, 2),
                            ("f16_32MB", jnp.float16, 32)]:
        nelem = mb * 1024 * 1024 // np.dtype(str(dtype.__name__)).itemsize

        def mk(s, _n=nelem, _d=dtype):
            return jnp.zeros((_n,), _d) + s

        mkj = jax.jit(mk)
        bufs = [mkj(jnp.asarray(i, dtype)) for i in range(3)]
        jax.block_until_ready(bufs)
        best = float("inf")
        for b in bufs:
            t0 = time.perf_counter()
            _ = np.asarray(jax.device_get(b))
            best = min(best, time.perf_counter() - t0)
        out[name] = round(mb / best, 2)
    print(json.dumps({"download_MBps": out}))


def mode_chunks():
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    _flip_sync(jax, dev)
    mk = jax.jit(lambda s, n: jnp.zeros((n,), jnp.int16) + s,
                 static_argnums=1)
    out = {}
    for nchunks, mb_each in [(1, 16), (4, 4), (16, 1)]:
        n = mb_each * 1024 * 1024 // 2
        bufs = [mk(jnp.int16(i), n) for i in range(nchunks)]
        jax.block_until_ready(bufs)
        t0 = time.perf_counter()
        for b in bufs:
            _ = np.asarray(jax.device_get(b))
        dt = time.perf_counter() - t0
        out[f"{nchunks}x{mb_each}MB"] = round(nchunks * mb_each / dt, 2)
        # threaded concurrent download of the chunks
        if nchunks > 1:
            bufs2 = [mk(jnp.int16(100 + i), n) for i in range(nchunks)]
            jax.block_until_ready(bufs2)
            t0 = time.perf_counter()
            ths = [threading.Thread(
                target=lambda b=b: np.asarray(jax.device_get(b)))
                for b in bufs2]
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            dt = time.perf_counter() - t0
            out[f"{nchunks}x{mb_each}MB_threaded"] = round(
                nchunks * mb_each / dt, 2)
    print(json.dumps({"download_MBps": out}))


if __name__ == "__main__":
    {"duplex": mode_duplex, "dtypes": mode_dtypes,
     "chunks": mode_chunks}[sys.argv[1]]()
