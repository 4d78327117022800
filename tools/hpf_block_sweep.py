#!/usr/bin/env python
"""Device sweep of the blocked high-pass section size (VERDICT r4
stretch item 9): the HPF is 7.9 ms of the 30.4 ms device synthesis
iteration; any globally-FIXED power-of-two section keeps the
batch-composition-independence contract, so the constant is free to
tune.  Measures the fused synthesis iteration per MAGPHASE_HPF_BLOCK
via the contention-immune scan-loop method.

Usage: python tools/hpf_block_sweep.py [blk ...]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tools"))
import jax
import numpy as np
from bench import _load_utts, FS
from device_bench import build_loop_kernel, prepare_args

args, statics, audio_s = prepare_args(_load_utts(), FS, 4096)
loop = build_loop_kernel()
key = jax.random.PRNGKey(0)
times = {{}}
for iters in (2, 18, 2, 18):
    t0 = time.perf_counter()
    v = float(jax.device_get(loop(*args, key, iters=iters, **statics)))
    times.setdefault(iters, []).append(time.perf_counter() - t0)
assert np.isfinite(v)
per_iter = (min(times[18]) - min(times[2])) / 16.0
print(json.dumps({{"blk": os.environ.get("MAGPHASE_HPF_BLOCK", "0"),
                   "ms_per_iter": round(per_iter * 1e3, 2),
                   "audio_s_per_s": round(audio_s / per_iter, 1)}}))
"""


def main(blks):
    out = []
    for blk in blks:
        env = dict(os.environ)
        env["MAGPHASE_HPF_BLOCK"] = str(blk)
        p = subprocess.run([sys.executable, "-c",
                            _WORKER.format(repo=REPO)],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        if p.returncode != 0:
            print(f"blk={blk} FAILED: {p.stderr[-500:]}", flush=True)
            continue
        r = json.loads(p.stdout.strip().splitlines()[-1])
        out.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"sweep": out}))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [0, 16384, 65536, 131072])
