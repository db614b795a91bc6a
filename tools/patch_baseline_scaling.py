"""Fill BENCH/BASELINE.md scaling placeholders from a run_scaling JSON."""
import json
import sys

res = json.load(open(sys.argv[1]))
p = "/root/repo/BENCH/BASELINE.md"
s = open(p).read()
t1 = res["t_n_sec"]
t4 = res["t_4n_sec"]
row1 = (f"| local[{res['n_cores']}] (N) | " +
        " | ".join(f"{x:.1f}" for x in t1) +
        f" | {res['t_n_median']:.1f} |")
row4 = (f"| local[{4 * res['n_cores']}] (4N) | " +
        " | ".join(f"{x:.1f}" for x in t4) +
        f" | {res['t_4n_median']:.1f} |")
s = s.replace("| local[1] (N) | SCALING_T1 | — | — | — |", row1)
s = s.replace("| local[4] (4N) | SCALING_T4 | — | — | — |", row4)
s = s.replace("SCALING_EFF", f"{res['value']:.3f}"
              + (" ≥ 0.8 ✓" if res["value"] >= 0.8 else " (< 0.8)"))
s = s.replace("SCALING_PER_REP",
              " / ".join(f"{x:.3f}" for x in res["per_rep_efficiency"])
              + f"; per-leg dispersion max/min "
              + str(res["per_leg_dispersion_max_over_min"])
              + f"; cool-down {res.get('cooldown_s', 0)}s before each leg")
open(p, "w").write(s)
print(row1)
print(row4)
print("eff:", res["value"], "per-rep:", res["per_rep_efficiency"])
