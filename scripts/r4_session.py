#!/usr/bin/env python
"""Round-4 TPU session driver: the remaining chip-bound studies in ONE
process (one axon claim): the quick extras first (train-step attribution
profile, VERDICT r3 next #5; event-loop paced-SLO serve bench, next #6),
then the 10%-data paper grid (next #2), then the seeded batch-scaling
study (next #4).

Under the axon tunnel every fresh TPU process can pay a multi-minute
claim; chaining the studies through one interpreter pays it once.  The
long stages are hash-cached + elastic-resumable, so re-running after a
kill continues exactly; the extras re-run cheaply (~10 min).

Usage:
    python scripts/r4_session.py [--skip-extras] [--skip-ds10]
        [--skip-bscale]
        [--ds10-data /root/grid_r3_big/params_data_big_ds10.yaml]
        [--bscale-data /root/grid_r3_big/params_data_big.yaml]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--skip-extras", action="store_true")
    parser.add_argument("--skip-ds10", action="store_true")
    parser.add_argument("--skip-bscale", action="store_true")
    parser.add_argument("--ds10-data",
                        default="/root/grid_r3_big/params_data_big_ds10.yaml")
    parser.add_argument("--bscale-data",
                        default="/root/grid_r3_big/params_data_big.yaml")
    parser.add_argument("--bscale-epochs", type=int, default=300)
    parser.add_argument("--only", default=None,
                        help="forwarded to run_waspaa2017 --only")
    args = parser.parse_args()

    import bench  # repo-root bench.py: backend bring-up + compile cache

    bench._enable_compile_cache()
    devs = bench._ensure_backend()
    print(f"[r4session] backend up: {devs[0].device_kind}", flush=True)

    failures = {}

    def stage(name, fn):
        """Stages are fault-isolated: a crash in one must not abort the
        session's remaining (hours-long, cached) studies."""
        t0 = time.time()
        print(f"[r4session] == {name} ==", flush=True)
        try:
            fn()
        except SystemExit as e:  # argparse/exit() inside a stage
            if e.code not in (0, None):
                failures[name] = f"SystemExit({e.code})"
        except Exception as e:
            import traceback

            traceback.print_exc()
            failures[name] = f"{type(e).__name__}: {e}"
        print(f"[r4session] {name} wall: {time.time() - t0:.0f}s",
              flush=True)

    def extras():
        sys.argv = ["bench.py"]  # no --serve-tcp-threads: event-loop server
        bench.bench_profile_train()
        bench.bench_serve_tcp()

    def ds10():
        import run_waspaa2017

        argv = ["--paper", "--data-config", args.ds10_data]
        if args.only:
            argv += ["--only", args.only]
        sys.argv = ["run_waspaa2017.py"] + argv
        run_waspaa2017.main()

    def bscale():
        import batch_scaling_study

        sys.argv = ["batch_scaling_study.py", "-d", args.bscale_data,
                    "--epochs", str(args.bscale_epochs)]
        batch_scaling_study.main()

    if not args.skip_extras:
        stage("quick extras: profile-train + serve SLO", extras)
    if not args.skip_ds10:
        stage("10%-data paper grid", ds10)
    if not args.skip_bscale:
        stage("seeded batch-scaling study", bscale)
    if failures:
        print(f"[r4session] FAILED stages: {failures}", flush=True)
        sys.exit(1)
    print("[r4session] all stages complete", flush=True)


if __name__ == "__main__":
    main()
