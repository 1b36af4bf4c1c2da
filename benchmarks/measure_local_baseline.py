"""Measure the reference library's ACTUAL single-core performance on this
host and emit BASELINE_LOCAL.{md,json}.

Eliminates the two classes of hand-waved anchors in bench_suite (VERDICT r3
weak #5): instead of scaling a 2011 i7's README cycle counts, the reference
is built HERE (portable-C and x86-64-asm variants, `make test` / `make asm`
in a scratch copy), its own `speed_test` (min-of-1000, TSC-overhead
subtracted — test/curve25519_test.c:130-321) is run, its rdtsc cycle counts
are converted with the MEASURED TSC frequency of this machine, and its
sha512.c is benchmarked directly. The mixed-pipeline baseline is composed
from the measured per-op times (6 protocol ops per lane), not estimated.

Usage: python benchmarks/measure_local_baseline.py [--refdir /root/reference]
Writes BASELINE_LOCAL.md and BASELINE_LOCAL.json at the repo root.

Run on an otherwise-idle host: the reference takes min-of-1000 so it is
fairly contention-robust, but don't time while pytest/compiles run
(CLAUDE.md benchmarking discipline).
"""

import argparse
import json
import re
import shutil
import subprocess
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_TSC_SRC = r"""
#include <stdio.h>
#include <x86intrin.h>
#include <time.h>
int main(){
    struct timespec a, b; struct timespec req = {0, 500000000};
    unsigned long long t0 = __rdtsc();
    clock_gettime(CLOCK_MONOTONIC, &a);
    nanosleep(&req, 0);
    unsigned long long t1 = __rdtsc();
    clock_gettime(CLOCK_MONOTONIC, &b);
    double dt = (b.tv_sec - a.tv_sec) + (b.tv_nsec - a.tv_nsec) * 1e-9;
    printf("%.0f\n", (t1 - t0) / dt);
    return 0;
}
"""

# bench the reference's own sha512.c (it has no speed_test row for SHA):
# 64-byte messages (the sign-path shape) and a 1 MiB stream
_SHA_BENCH_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include "../source/sha512.h"
static double now(){ struct timespec t; clock_gettime(CLOCK_MONOTONIC,&t);
    return t.tv_sec + t.tv_nsec*1e-9; }
int main(){
    static unsigned char msg[1<<20];
    unsigned char out[64];
    for (int i = 0; i < (1<<20); i++) msg[i] = (unsigned char)(i*7);
    SHA512_CTX ctx;
    int n = 200000;
    double t0 = now();
    for (int i = 0; i < n; i++){
        SHA512_Init(&ctx); SHA512_Update(&ctx, msg, 64);
        SHA512_Final(out, &ctx);
    }
    double per64 = (now() - t0) / n;
    int m = 400;
    t0 = now();
    for (int i = 0; i < m; i++){
        SHA512_Init(&ctx); SHA512_Update(&ctx, msg, 1<<20);
        SHA512_Final(out, &ctx);
    }
    double stream = (1.0*(1<<20)) * m / (now() - t0);
    printf("{\"sha512_64b_ops\": %.1f, \"sha512_stream_Bps\": %.1f}\n",
           1.0/per64, stream);
    return 0;
}
"""


def tsc_hz(tmp: Path) -> float:
    src = tmp / "tsc.c"
    src.write_text(_TSC_SRC)
    exe = tmp / "tsc"
    subprocess.run(["gcc", "-O2", "-o", str(exe), str(src)], check=True)
    vals = [float(subprocess.run([str(exe)], capture_output=True, text=True,
                                 check=True).stdout) for _ in range(3)]
    return sorted(vals)[1]


def parse_speed(output: str):
    """Pull the labeled cycle counts out of speed_test's report."""
    rows = {}
    mehdi = [int(m) for m in re.findall(r"Mehdi:\s+(\d+) cycles", output)]
    donna = [int(m) for m in re.findall(r"Donna:\s+(\d+) cycles", output)]
    if len(mehdi) >= 2:
        rows["dh_point_mult"] = mehdi[0]        # ladder shared-secret class
        rows["dh_base_fast"] = mehdi[1]         # folding base mult
    if donna:
        rows["donna_point_mult"] = donna[0]
    for label, key in [("KeyGen", "keygen"), ("Sign", "sign")]:
        for m in re.finditer(rf"{label}:\s+(\d+) cycles([^\n]*)", output):
            c, rest = int(m.group(1)), m.group(2)
            rows.setdefault(key + "_blinded" if "Blinded" in rest else key,
                            c)
    for m in re.finditer(r"Verify:\s+(\d+) cycles([^\n]*)", output):
        c, rest = int(m.group(1)), m.group(2)
        rows.setdefault("verify_init" if "Init" in rest else "verify", c)
    mc = re.search(r"^\s+(\d+) cycles[^\n]*\(Check\)", output, re.M)
    if mc:
        rows["verify_check"] = int(mc.group(1))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refdir", default="/root/reference")
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="refbaseline"))
    work = tmp / "ref"
    shutil.copytree(args.refdir, work)
    hz = tsc_hz(tmp)

    results = {}
    for target, binary, name in [
            ("test", "curve25519_test", "portable_c64"),
            ("asm", "curve25519_test_x64", "asm64")]:
        subprocess.run(["make", target], cwd=work, check=True,
                       capture_output=True)
        out = subprocess.run([str(work / "test" / "build64" / binary)],
                             capture_output=True, text=True)
        results[name] = parse_speed(out.stdout)

    # reference sha512.c direct bench
    sha_src = work / "test" / "sha_bench.c"
    sha_src.write_text(_SHA_BENCH_SRC)
    sha_exe = tmp / "sha_bench"
    subprocess.run(["gcc", "-O2", "-I", str(work / "include"),
                    "-o", str(sha_exe), str(sha_src),
                    str(work / "source" / "sha512.c")], check=True)
    sha = json.loads(subprocess.run([str(sha_exe)], capture_output=True,
                                    text=True, check=True).stdout)

    best = results["asm64"]     # the reference's fastest local build

    def ops(cycles):
        return hz / cycles

    mixed_t = (2 * best["dh_base_fast"] + best["dh_point_mult"]
               + best["keygen"] + best["sign"] + best["verify"]) / hz
    baselines = {
        "x25519_shared_secret": ops(best["dh_point_mult"]),
        "x25519_single_call_latency": ops(best["dh_point_mult"]),
        "x25519_public_key_ladder": ops(best["dh_point_mult"]),
        "x25519_public_key_fast": ops(best["dh_base_fast"]),
        "x25519_public_key_fold4": ops(best["dh_base_fast"]),
        "x25519_public_key_fast_single": ops(best["dh_base_fast"]),
        "ed25519_keygen": ops(best["keygen"]),
        "ed25519_keygen_single": ops(best["keygen"]),
        "ed25519_sign": ops(best["sign"]),
        "ed25519_sign_single": ops(best["sign"]),
        "ed25519_sign_blinded": ops(best["sign_blinded"]),
        "ed25519_verify_init": ops(best["verify_init"]),
        "ed25519_verify_check": ops(best["verify_check"]),
        "ed25519_verify_check_shared": ops(best["verify_check"]),
        "ed25519_verify_check_multipk": ops(best["verify_check"]),
        "ed25519_verify_oneshot": ops(best["verify"]),
        "sha512_64b": sha["sha512_64b_ops"],
        "sha512_long": sha["sha512_stream_Bps"],
        "mixed_dh_sign_verify": 6.0 / mixed_t,
    }

    record = {
        "tsc_hz": hz,
        "cpu": next((l.split(":", 1)[1].strip()
                     for l in open("/proc/cpuinfo")
                     if l.startswith("model name")), "unknown"),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "cycles": results,
        "sha512_ref": sha,
        "baselines_ops_per_s": {k: round(v, 1)
                                for k, v in baselines.items()},
    }
    (ROOT / "BASELINE_LOCAL.json").write_text(json.dumps(record, indent=1))

    lines = [
        "# BASELINE_LOCAL — the reference measured on THIS host",
        "",
        f"CPU: {record['cpu']}; TSC = {hz / 1e9:.3f} GHz (calibrated).",
        f"Measured {record['measured_at']} by "
        "`python benchmarks/measure_local_baseline.py`: the reference was",
        "built here (`make test` portable-C, `make asm` x86-64 assembly) and",
        "its own `speed_test` run (min-of-1000 cycles, TSC-overhead",
        "subtracted — test/curve25519_test.c:130-321). Cycle counts are",
        "rdtsc ticks converted at the measured TSC rate. SHA-512 rows bench",
        "the reference's source/sha512.c directly (it has no speed_test",
        "row). `bench_suite.py` reads BASELINE_LOCAL.json for every",
        "vs_baseline column.",
        "",
        "| op | portable C64 cycles | asm64 cycles | asm64 us | asm64 ops/s |",
        "|---|---|---|---|---|",
    ]
    for key, label in [
            ("dh_point_mult", "X25519 point mult (shared key)"),
            ("dh_base_fast", "X25519 base mult (folding)"),
            ("keygen", "Ed25519 KeyGen"),
            ("sign", "Ed25519 Sign"),
            ("sign_blinded", "Ed25519 Sign (blinded)"),
            ("verify", "Ed25519 Verify (one-shot)"),
            ("verify_init", "Verify_Init"),
            ("verify_check", "Verify_Check"),
            ("donna_point_mult", "curve25519-donna point mult")]:
        c = results["portable_c64"].get(key)
        a = results["asm64"].get(key)
        if a is None:
            continue
        lines.append(f"| {label} | {c if c else '—'} | {a} | "
                     f"{a / hz * 1e6:.2f} | {hz / a:,.0f} |")
    lines += [
        "",
        f"Reference sha512.c: {sha['sha512_64b_ops']:,.0f} 64-byte "
        f"hashes/s; {sha['sha512_stream_Bps'] / 1e6:.1f} MB/s streaming.",
        f"Mixed 6-op pipeline baseline (composed from measured rows): "
        f"{6.0 / mixed_t:,.0f} ops/s.",
        "",
        "Derived per-metric baselines (asm64 build — the strongest local "
        "form of the reference):",
        "",
        "| metric | baseline ops/s |",
        "|---|---|",
    ]
    for k, v in sorted(record["baselines_ops_per_s"].items()):
        lines.append(f"| {k} | {v:,.1f} |")
    (ROOT / "BASELINE_LOCAL.md").write_text("\n".join(lines) + "\n")
    print(json.dumps(record["baselines_ops_per_s"], indent=1))
    print(f"wrote {ROOT / 'BASELINE_LOCAL.md'} and .json (tsc={hz / 1e9:.3f} GHz)")
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
