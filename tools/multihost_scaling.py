#!/usr/bin/env python
"""Multi-host corpus-scale scaling evidence (round-3 VERDICT item 3).

Runs the FULL `cli extract` + `cli generate` corpus workflow at 1, 2 and
4 emulated hosts (separate OS processes joined through a localhost
jax.distributed coordinator — the same code path a real multi-host TPU
deployment takes, with the CPU backend standing in for the chips),
verifies the merged outputs are byte-identical to the single-host run,
and writes SCALING.md with the per-host timing table.

Real multi-chip hardware is not reachable from this environment (one
v5e chip over a tunnel), so wall-clock here measures ORCHESTRATION
scaling — disjoint partitioning, coordinator overhead, per-host
manifests — not device scaling; the device-level story is the
zero-collectives shard_map proof in `__graft_entry__.dryrun_multichip`.

Usage: python tools/multihost_scaling.py [out_md]
"""
import glob
import hashlib
import json
import os
import shutil
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = "/root/reference/demos/data_48k/wavs_nat"
FS = 16000
N_UTTS = 20          # 10 demo wavs cycled at varied trims: realistic
                     # duration SPREAD so the LPT duration balancing has
                     # something to balance (10 near-equal utterances
                     # cap 4-host balance at ~0.67 by count alone)

_WRAP = ("import sys, json; sys.path.insert(0, {repo!r}); "
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "from magphase_tpu.cli import main; "
         "sys.exit(main(json.loads({args!r})))")


def _make_corpus(root):
    from scipy import signal as sp

    from magphase_tpu.io import read_wav, write_wav
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    toks = []
    total_audio = 0.0
    wavs = sorted(glob.glob(f"{DATA}/*.wav"))
    for i in range(N_UTTS):
        w = wavs[i % len(wavs)]
        tok = os.path.basename(w)[:-4] + (f"_c{i // len(wavs)}"
                                          if i >= len(wavs) else "")
        sig, fs = read_wav(w)
        sig16 = sp.resample_poly(sig, 1, 3)
        # deterministic varied trims (0.4x..1.0x): a realistic duration
        # spread for the duration-balanced partitioner
        keep = int(len(sig16) * (0.4 + 0.6 * ((i * 7) % N_UTTS) / N_UTTS))
        sig16 = sig16[:max(keep, FS // 2)]
        write_wav(os.path.join(wav_dir, tok + ".wav"), sig16, FS)
        total_audio += len(sig16) / FS
        toks.append(tok)
    scp = os.path.join(root, "file_id.scp")
    with open(scp, "w") as f:
        f.write("\n".join(toks) + "\n")
    return toks, wav_dir, scp, total_audio


def _cmd(args):
    return [sys.executable, "-c",
            _WRAP.format(repo=REPO, args=json.dumps(args))]


def _env(extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    if extra:
        env.update(extra)
    return env


def _parse_metrics(stderr: str):
    """Per-host summary from the utils.metrics log line."""
    for line in reversed(stderr.splitlines()):
        if "INFO metrics " in line:
            return json.loads(line.split("INFO metrics ", 1)[1])
    return {}


def _run_phase(args, nprocs):
    """Run one CLI command at ``nprocs`` emulated hosts.

    Returns (wall_s, [per-host metrics dict])."""
    t0 = time.perf_counter()
    if nprocs == 1:
        p = subprocess.run(_cmd(args), env=_env(), cwd=REPO,
                           capture_output=True, text=True, timeout=1800)
        assert p.returncode == 0, p.stderr[-4000:]
        return time.perf_counter() - t0, [_parse_metrics(p.stderr)]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(nprocs):
        procs.append(subprocess.Popen(
            _cmd(args), cwd=REPO,
            env=_env({"JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                      "JAX_NUM_PROCESSES": str(nprocs),
                      "JAX_PROCESS_ID": str(pid)}),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    per_host = []
    for p in procs:
        _, err = p.communicate(timeout=1800)
        assert p.returncode == 0, err[-4000:]
        per_host.append(_parse_metrics(err))
    return time.perf_counter() - t0, per_host


def _tree_hash(d):
    h = hashlib.sha256()
    for f in sorted(os.listdir(d)):
        if f.startswith("."):
            continue
        with open(os.path.join(d, f), "rb") as fh:
            h.update(f.encode())
            h.update(fh.read())
    return h.hexdigest()


def main(out_md=os.path.join(REPO, "SCALING.md")):
    root = "/tmp/magphase_scaling"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    toks, wav_dir, scp, audio_s = _make_corpus(root)

    ncores = os.cpu_count()
    rows = []
    hashes = {}
    for n in (1, 2, 4):
        out = os.path.join(root, f"hosts{n}")
        feats, wavs = os.path.join(out, "feats"), os.path.join(out, "wavs")
        t_ex, mx = _run_phase(["extract", "--scp", scp, "--wav-dir",
                               wav_dir, "--out-dir", feats,
                               "--batch-size", "4"], n)
        t_gen, mg = _run_phase(["generate", "--scp", scp, "--feats-dir",
                                feats, "--out-dir", wavs, "--fs", str(FS),
                                "--batch-size", "4", "--pf-type", "no"], n)
        hashes[n] = (_tree_hash(feats), _tree_hash(wavs))
        manifests = glob.glob(os.path.join(feats, ".magphase_manifest.p*"))
        def _audio(ms):
            return [round(m.get("audio_seconds", 0.0), 1) for m in ms]

        def _proc(ms):
            return [round(m.get("stages", {}).get("process", {})
                          .get("s", 0.0), 1) for m in ms]

        per_host_audio = _audio(mx)
        rows.append(dict(
            hosts=n, extract_wall_s=round(t_ex, 1),
            generate_wall_s=round(t_gen, 1),
            per_host_audio_s=per_host_audio,
            per_host_process_s=_proc(mx),
            gen_per_host_process_s=_proc(mg),
            partition_balance=round(
                min(per_host_audio) / max(max(per_host_audio), 1e-9), 3),
            gen_balance=round(
                min(_audio(mg)) / max(max(_audio(mg)), 1e-9), 3),
            manifests=len(manifests) or 1))

    ident = all(hashes[n] == hashes[1] for n in hashes)
    assert ident, f"multi-host outputs differ from single-host: {hashes}"

    lines = [
        "# Multi-host corpus runs — correctness and scaling evidence",
        "",
        "Full `cli extract` + `cli generate` workflow over the "
        f"{N_UTTS}-utterance demo corpus ({audio_s:.1f} audio-s at "
        f"{FS/1000:.0f} kHz), run at 1/2/4 emulated hosts: separate OS "
        "processes joined through a `jax.distributed` localhost "
        "coordinator — the exact code path of a real multi-host "
        "deployment, with the CPU backend standing in for TPU chips.",
        "",
        "## What is proven here",
        "",
        "1. **Byte-identical merges.** The union of the hosts' outputs "
        "equals the single-host run byte for byte (SHA-256 over every "
        "feature file and waveform) at 2 and 4 hosts.  This is designed, "
        "not accidental: per-utterance noise keys derive from the GLOBAL "
        "scp index, the adaptive synthesis FFT is floored at the 50 Hz "
        "worst case (`det_fft_syn`), and the high-pass uses "
        "length-independent overlap-save blocks — no output sample "
        "depends on which utterances share a batch or a host.  Gated "
        "continuously by `tests/test_multihost_corpus.py`.",
        "2. **Disjoint balanced partitions.** Each host writes its own "
        "manifest over a duration-balanced token shard (greedy "
        "longest-first LPT over per-utterance audio seconds, "
        "`parallel/mesh.py:partition_tokens` — the static analogue of "
        "Pool's dynamic self-balancing); shards are disjoint, "
        "cover the corpus, and carry near-equal audio seconds (the "
        "`balance` column = min/max per-host audio).",
        "3. **Fault-isolated resume.** Per-host manifests mean a host "
        "crash loses only its in-flight chunk; re-running resumes from "
        "the manifests (same contract as single-host).",
        "",
        "| hosts | extract wall s | generate wall s | per-host audio-s "
        "| extract per-host process s | generate per-host process s | "
        "balance (ex / gen) | manifests |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['hosts']} | {r['extract_wall_s']} | "
            f"{r['generate_wall_s']} | {r['per_host_audio_s']} | "
            f"{r['per_host_process_s']} | {r['gen_per_host_process_s']} | "
            f"{r['partition_balance']} / {r['gen_balance']} | "
            f"{r['manifests']} |")
    lines += [
        "",
        "## What wall-clock here cannot prove — and what covers it",
        "",
        f"This machine has **{ncores} CPU cores and one TPU chip**, so "
        "N emulated hosts contend for the same silicon: wall time grows "
        "with N (per-process jax start-up is ~10 s of the total) and no "
        "emulated configuration can exhibit real speedup.  The "
        "scaling-efficiency argument for real hardware is therefore "
        "structural, and it is strong:",
        "",
        "* **Zero inter-host communication in the workload.**  Hosts "
        "share nothing but the filesystem; each drives its own local "
        "device batch (the reference's Pool semantics, libutils.py:32-63,"
        " lifted to whole hosts).",
        "* **Zero inter-device communication within a host.**  "
        "`__graft_entry__.dryrun_multichip` compiles the production "
        "kernels under an 8-device `shard_map` mesh, asserts sharded == "
        "unsharded outputs to ulp AND pins the optimized HLO to ZERO "
        "collectives.  Per-chip work is embarrassingly parallel by "
        "construction.",
        "* Therefore corpus throughput scales linearly in chips and "
        "hosts up to each host's link bandwidth — the >=85% BASELINE "
        "target reduces to per-host link provisioning, which the "
        "host-link roofline in `bench.py` (analysis_link_roofline) "
        "tracks per round.",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"rows": rows, "byte_identical": ident,
                      "out": out_md}))


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
