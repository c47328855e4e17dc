#!/usr/bin/env python
"""Round-5 TPU session driver: the remaining chip-bound round-5 studies in
ONE process (one axon claim), fault-isolated and budget-aware, in value
order:

  1. profile   — bench --profile-train with the round-5 additions: the
     grad-wrt-x attribution probe (sequential delta chain vs weight-grad
     accumulation) and the batched-T backward A/B (VERDICT r4 next #3).
  2. snmf-ab   — XLA MU core vs the round-5 bf16-MXU Pallas kernel at
     tile 128/256 (VERDICT r4 next #8 'win or close').
  3. paced-slo — the server-internal paced SLO table (VERDICT r4 next
     #9): 32@152ms / 64@152ms / 64@536ms without client-side process
     starvation.
  4. bscale    — the seeded batch-scaling study (VERDICT r4 next #6,
     B=256 STOI regression).  Bounded, so it runs BEFORE the
     open-ended shakeout.
  5. shakeout  — the CHiME2-scale end-to-end measurement
     (scripts/scale_shakeout.py, VERDICT r4 next #2): 7,138 train
     utterances, featurize + ONE flagship epoch + enhancement + SNMF
     dictionary, wall-clock per stage; absorbs the remaining budget
     (its stages are individually cached).

Usage: python scripts/r5_session.py [--budget-s 10800] [--skip NAMES]
         [--shakeout-files 7138] [--bscale-epochs 300]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--budget-s", type=float, default=10800.0)
    ap.add_argument("--skip", default="", help="comma list of stage names")
    ap.add_argument("--shakeout-files", type=int, default=7138)
    ap.add_argument("--bscale-epochs", type=int, default=300)
    args = ap.parse_args()
    skip = set(s for s in args.skip.split(",") if s)

    t_start = time.time()
    deadline = t_start + args.budget_s
    os.environ["DRNMF_TRAIN_DEADLINE_TS"] = repr(deadline)
    # periodic checkpoint/state writes: the per-epoch host fetch costs
    # seconds behind the tunnel (train/loop.py DRNMF_STATE_EVERY)
    os.environ.setdefault("DRNMF_STATE_EVERY", "16")

    import bench

    bench._enable_compile_cache()
    devs = bench._ensure_backend()
    print(f"[r5session] backend up: {devs[0].device_kind}", flush=True)

    failures = {}

    def remaining():
        return deadline - time.time()

    def stage(name, fn, est_s=0.0):
        if name in skip:
            return
        if remaining() < est_s:
            print(f"[r5session] SKIP {name} (budget {remaining():.0f}s "
                  f"left, est {est_s:.0f}s)", flush=True)
            failures.setdefault(name, "skipped: budget")
            return
        t0 = time.time()
        print(f"[r5session] == {name} == ({remaining():.0f}s left)",
              flush=True)
        try:
            fn()
        except SystemExit as e:
            if e.code not in (0, None):
                failures[name] = f"SystemExit({e.code})"
        except Exception as e:
            import traceback

            traceback.print_exc()
            failures[name] = f"{type(e).__name__}: {e}"
        print(f"[r5session] {name} wall: {time.time() - t0:.0f}s",
              flush=True)

    def profile():
        bench.bench_profile_train()

    def snmf_ab():
        bench.bench_snmf()

    def paced_slo():
        bench.bench_paced_slo()

    def shakeout():
        import scale_shakeout

        sys.argv = ["scale_shakeout.py", "--files",
                    str(args.shakeout_files)]
        scale_shakeout.main()

    def bscale():
        import batch_scaling_study

        from drnmf_tpu.train import TrainingDeadline

        data_cfg = os.path.join(REPO, "runs", "grid_r4",
                                "params_data_big.yaml")
        if not os.path.exists(data_cfg):
            print("[r5session] bscale: grid_r4 data config missing; "
                  "run r4_session provision first", flush=True)
            return
        os.chdir(os.path.join(REPO, "runs", "grid_r4"))
        for seeds in ("7654", "1234", "9999", "7654,1234,9999"):
            if remaining() <= 0 and "," not in seeds:
                print("[r5session] bscale: budget out; partial seeds",
                      flush=True)
                continue
            sys.argv = ["batch_scaling_study.py", "-d", data_cfg,
                        "--epochs", str(args.bscale_epochs),
                        "--seeds", seeds]
            try:
                batch_scaling_study.main()
            except TrainingDeadline:
                print(f"[r5session] bscale seeds={seeds}: deadline "
                      f"(state saved)", flush=True)

    stage("profile", profile, est_s=240)
    stage("snmf-ab", snmf_ab, est_s=180)
    stage("paced-slo", paced_slo, est_s=300)
    # bscale BEFORE shakeout: the study is bounded (~15-25 min) while the
    # full-scale shakeout can absorb an hour+; shakeout's stages are
    # individually cached so a budget cutoff still yields the early-stage
    # measurements, whereas a skipped bscale yields nothing
    stage("bscale", bscale, est_s=600)
    stage("shakeout", shakeout, est_s=900)

    real = {k: v for k, v in failures.items()
            if not v.startswith("skipped")}
    print(f"[r5session] done in {time.time() - t_start:.0f}s; "
          f"failures: {failures or 'none'}", flush=True)
    sys.exit(1 if real else 0)


if __name__ == "__main__":
    main()
