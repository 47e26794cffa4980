"""One-off: trace the global-scale BA LM step and print top device ops."""

import glob
import gzip
import json
import sys
from collections import defaultdict

LOGDIR = "/tmp/trace_ba"


def capture():
    import jax
    from ptam_cg_tpu.models import bundle
    from bench_ba import make_problem

    prob, cam = make_problem(64, 4096, 16384, seed=3)
    step = jax.jit(lambda s: bundle.lm_step(s, cam))
    state = bundle.init_lm(prob)
    state = step(state)
    state = step(state)
    jax.block_until_ready(state)

    jax.profiler.start_trace(LOGDIR)
    for _ in range(10):
        state = step(state)
    jax.block_until_ready(state)
    jax.profiler.stop_trace()
    print("trace captured; iters:", int(state.iters))


def report():
    files = sorted(glob.glob(LOGDIR + "/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pid_names.items() if "TPU" in nm}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tot[e.get("name", "?")] += float(e.get("dur", 0.0))
        cnt[e.get("name", "?")] += 1
    for name, d in sorted(tot.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{d/1e3:9.3f} ms  x{cnt[name]:5d}  {name[:100]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report()
    else:
        capture()
        report()
