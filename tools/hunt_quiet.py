#!/usr/bin/env python3
"""Quiet-window hunter (rounds 8+; log path via HUNT_LOG, default r9): loop cheap extraction-tell probes and
fire the heavy measurement payloads the moment the host goes quiet.

Payloads, in priority order:
  1. scaling pair  -- PipeProfile 8M then 4M at 16c (VERDICT r7 item 2);
     fires when the 16c/8M tell >= SCALE_THRESH.
  2. bench record  -- full Bench sweep at 32c over sf0.1 (VERDICT r7
     item 6); fires when the 32c/100k tell >= BENCH_THRESH.

Everything (probes, attempts, adopted runs) is appended to the jsonl
log; contaminated attempts stay logged, never hidden. Exits when both
payloads have landed a quiet run or the deadline passes.

Usage: python3 tools/hunt_quiet.py <repo_dir> <hours>
"""
import json, os, re, subprocess, sys, time

REPO = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_ab"
HOURS = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
LOG = os.environ.get("HUNT_LOG", "/root/repo/BENCH/scaling_runs_r9.jsonl")
# artifact prefix follows the log's round token (review r9: a round-10
# HUNT_LOG must not write its bench artifacts under an r9 name)
_m = re.search(r"_r(\d+)\.jsonl$", LOG)
ROUND = f"r{_m.group(1)}" if _m else "rX"
BENCH_OUT_DIR = "/root/repo/BENCH"
# Thresholds are env-tunable (r9): r8 logged 86 probes without ever
# reaching 430k, so a round may choose to fire payloads on the best
# windows the host actually offers (the payload's own per-repeat tells
# remain the disclosed quality gate — firing lower never hides load).
SCALE_THRESH = int(os.environ.get("HUNT_SCALE_THRESH", 430_000))  # 16c quiet ~ 500k; r7 best 8M leg ran at 461k
BENCH_THRESH = int(os.environ.get("HUNT_BENCH_THRESH", 420_000))  # 32c/100k historic quiet = 500k
# The quiet VERDICT on a scaling pair is anchored to the historic bar,
# NOT the (possibly lowered) fire threshold — otherwise firing lower
# would relabel loaded pairs as quiet and end the hunt (review r9; the
# bench payload's verdict was already anchored via pct_of_historic).
SCALE_QUIET_VERDICT = 430_000
PROBE_GAP_S = 180

def log(obj):
    obj["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(LOG, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print(json.dumps(obj), flush=True)

def sbt(main_args, cpus, extra_env=None, timeout=1200):
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    if extra_env:
        env.update(extra_env)
    try:
        r = subprocess.run(["sbt", "-batch", f"runMain {main_args}"],
                           cwd=REPO, env=env, capture_output=True,
                           text=True, timeout=timeout)
        return r.stdout
    except subprocess.TimeoutExpired:
        return ""

def probe(cpus, docs):
    out = sbt(f"graft.TellProbe {docs}", cpus)
    m = re.search(r'\{"tell_probe":(\d+)', out)
    return int(m.group(1)) if m else None

def pipe_profile(docs, cpus, repeats=2):
    out = sbt(f"graft.PipeProfile {docs} {repeats}", cpus, timeout=2400)
    return [json.loads(l) for l in out.splitlines()
            if l.strip().startswith('{"profile"')]

def run_scaling_pair():
    r8 = pipe_profile(8_000_000, 16)
    r4 = pipe_profile(4_000_000, 16)
    log({"attempt": "scaling-pair", "p8m": r8, "p4m": r4})
    tells8 = [r["tell_docs_per_sec"] for r in r8]
    tells4 = [r["tell_docs_per_sec"] for r in r4]
    quiet = (tells8 and tells4 and max(tells8) >= SCALE_QUIET_VERDICT
             and max(tells4) >= SCALE_QUIET_VERDICT)
    log({"attempt": "scaling-pair-verdict", "quiet": quiet,
         "tells8": tells8, "tells4": tells4})
    return quiet

def run_bench():
    out = sbt("graft.Bench", 32,
              {"SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
               # the hunter may run from a worktree: the historical quiet
               # reference must stay the repo's single source of truth
               "SPARK_GRAFT_QUIET_REF": "/root/repo/BENCH/quiet_ref.json"},
              timeout=2400)
    src = os.path.join(REPO, "bench_out.json")
    if not os.path.exists(src):
        log({"attempt": "bench", "error": "no bench_out.json"})
        return False
    line = open(src).read().strip()
    j = json.loads(line)
    pct = j.get("pct_of_historic_quiet", [])
    quiet = bool(pct) and max(pct) >= 90
    stamp = time.strftime("%H%M", time.gmtime())
    dst = os.path.join(BENCH_OUT_DIR, f"bench_sf01_{ROUND}_{stamp}.json")
    with open(dst, "w") as f:
        f.write(line + "\n")
    log({"attempt": "bench", "quiet": quiet, "artifact": dst,
         "median": j.get("median"), "pct_of_historic_quiet": pct,
         "tells": j.get("sweep_tells_docs_per_sec")})
    return quiet

def main():
    deadline = time.time() + HOURS * 3600
    scaling_done = bench_done = False
    while time.time() < deadline and not (scaling_done and bench_done):
        if not scaling_done:
            t = probe(16, 8_000_000)
            log({"probe": "16c/8m", "tell": t})
            if t and t >= SCALE_THRESH:
                scaling_done = run_scaling_pair()
                continue
        if not bench_done:
            t = probe(32, 100_000)
            log({"probe": "32c/100k", "tell": t})
            if t and t >= BENCH_THRESH:
                bench_done = run_bench()
                continue
        time.sleep(PROBE_GAP_S)
    log({"hunter": "exit", "scaling_done": scaling_done,
         "bench_done": bench_done})

if __name__ == "__main__":
    main()
