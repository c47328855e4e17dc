#!/usr/bin/env python
"""Round-4 TPU session driver: every chip-bound round-4 study in ONE
process (one axon claim), self-provisioning and budget-aware.

Stages, in value order (each fault-isolated):

  1. bench-full  — the driver's default perf capture (enhance / train /
     loop / score JSON lines) plus the extras (train-step attribution
     profile, raw + TCP serving SLO, SNMF MU throughput).  Validates the
     BENCH_r04 path end-to-end and warms the persistent compile cache.
  2. ds10 grid   — the 10-model WASPAA grid at the PAPER schedule on the
     10%-data condition (downsample=10 strides the train taskfile only,
     audio_dataset.py:218-219): VERDICT r3 next #2.
  3. ds1 grid    — the same grid on 100% data, same corpus, so the
     both-conditions table (print_scores.py:34 layout) comes from one
     corpus instance.
  4. bscale      — the seeded batch-scaling study (3 shuffle seeds per
     arm): VERDICT r3 next #4.
  5. report      — the combined both-conditions score table.

The corpus + data configs are regenerated deterministically under
runs/grid_r4/ (gitignored) if missing — out-of-repo artifacts do not
survive VM restarts.  Long stages are hash-cached + elastic-resumable;
training honors DRNMF_TRAIN_DEADLINE_TS (set from --budget-s) by aborting
cleanly at an epoch boundary with resume state on disk, so the session
never needs to be killed (a killed TPU client wedges the tunnel).

Usage:
    python scripts/r4_session.py [--budget-s 32400] [--skip-bench]
        [--skip-ds10] [--skip-ds1] [--skip-bscale] [--only IDXS]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

WORKDIR = os.path.join(REPO, "runs", "grid_r4")


def provision(workdir):
    """Deterministic corpus + data configs under ``workdir`` (idempotent)."""
    from drnmf_tpu.data import make_synthetic_corpus
    from drnmf_tpu.utils import dump_yaml

    audio_root = os.path.join(workdir, "audio")
    tf_noisy = os.path.join(audio_root, "taskfile_noisy.txt")
    tf_clean = os.path.join(audio_root, "taskfile_clean.txt")
    if not (os.path.exists(tf_noisy) and os.path.exists(tf_clean)):
        print("[r4session] generating 48-file synthetic corpus", flush=True)
        make_synthetic_corpus(audio_root, n_files=48, seed=2016,
                              min_sec=2.0, max_sec=5.0)
    paths = {}
    for ds, name in ((1, "params_data_big.yaml"),
                     (10, "params_data_big_ds10.yaml")):
        cfg = {
            "downsample": ds,
            "maxlen": 500,
            "params_stft": {"N": 512, "hop": 128, "nch": 1},
            "transform_x": "mag",
            "transform_y": "mag",
        }
        for split in ("train", "valid", "test"):
            cfg[f"taskfile_x_{split}"] = tf_noisy
            cfg[f"taskfile_y_{split}"] = tf_clean
        path = os.path.join(workdir, name)
        if not os.path.exists(path):
            dump_yaml(cfg, path)
        paths[ds] = path
    return paths


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--budget-s", type=float, default=32400.0,
                        help="wall budget; training aborts cleanly (with "
                        "resume state) at the first epoch boundary past it")
    parser.add_argument("--skip-bench", action="store_true")
    parser.add_argument("--skip-ds10", action="store_true")
    parser.add_argument("--skip-ds1", action="store_true")
    parser.add_argument("--skip-bscale", action="store_true")
    parser.add_argument("--bscale-epochs", type=int, default=300)
    parser.add_argument("--only", default=None,
                        help="grid indices (comma list) for both grid stages")
    args = parser.parse_args()

    t_start = time.time()
    deadline = t_start + args.budget_s
    os.environ["DRNMF_TRAIN_DEADLINE_TS"] = repr(deadline)
    # periodic checkpoint/state writes: the per-epoch host fetch costs
    # seconds behind the tunnel (train/loop.py DRNMF_STATE_EVERY)
    os.environ.setdefault("DRNMF_STATE_EVERY", "16")

    os.makedirs(WORKDIR, exist_ok=True)
    os.chdir(WORKDIR)  # experiment dirs (data_setup_*) land here

    import bench  # repo-root bench.py: backend bring-up + compile cache

    bench._enable_compile_cache()
    devs = bench._ensure_backend()
    print(f"[r4session] backend up: {devs[0].device_kind}", flush=True)

    data_cfgs = provision(WORKDIR)

    from drnmf_tpu.train import TrainingDeadline

    failures = {}
    out_of_budget = [False]

    def remaining():
        return deadline - time.time()

    def stage(name, fn, est_s=0.0, always=False):
        """Fault-isolated; skipped when the budget clearly cannot fit it."""
        if not always and (out_of_budget[0] or remaining() < est_s):
            print(f"[r4session] SKIP {name} (budget: {remaining():.0f}s "
                  f"left, est {est_s:.0f}s)", flush=True)
            failures.setdefault(name, "skipped: budget")
            return
        t0 = time.time()
        print(f"[r4session] == {name} == ({remaining():.0f}s budget left)",
              flush=True)
        try:
            fn()
        except TrainingDeadline as e:
            print(f"[r4session] {name}: {e}", flush=True)
            out_of_budget[0] = True
            failures[name] = "budget: training deadline (state saved)"
        except SystemExit as e:  # argparse/exit() inside a stage
            if e.code not in (0, None):
                failures[name] = f"SystemExit({e.code})"
        except Exception as e:
            import traceback

            traceback.print_exc()
            failures[name] = f"{type(e).__name__}: {e}"
        print(f"[r4session] {name} wall: {time.time() - t0:.0f}s",
              flush=True)

    def bench_full():
        sys.argv = ["bench.py"]  # no --serve-tcp-threads: event-loop server
        bench._run_default()
        bench.bench_profile_train()
        bench.bench_serving()
        bench.bench_serve_tcp()
        bench.bench_snmf()

    def grid(ds):
        import run_waspaa2017

        idxs = ([s.strip() for s in args.only.split(",")]
                if args.only else [str(i) for i in range(1, 11)])
        for i in idxs:
            if remaining() <= 0:
                out_of_budget[0] = True
                print(f"[r4session] grid ds{ds}: budget out before model "
                      f"{i}; rerun resumes from caches", flush=True)
                return
            sys.argv = ["run_waspaa2017.py", "--paper",
                        "--data-config", data_cfgs[ds], "--only", i]
            run_waspaa2017.main()

    def bscale():
        import batch_scaling_study

        for seeds in ("7654", "1234", "9999", "7654,1234,9999"):
            if remaining() <= 0 and "," not in seeds:
                out_of_budget[0] = True
                print("[r4session] bscale: budget out; partial seeds only",
                      flush=True)
                continue  # still run the aggregate over finished caches
            sys.argv = ["batch_scaling_study.py", "-d", data_cfgs[1],
                        "--epochs", str(args.bscale_epochs),
                        "--seeds", seeds]
            try:
                batch_scaling_study.main()
            except TrainingDeadline:
                out_of_budget[0] = True
                print(f"[r4session] bscale seeds={seeds}: deadline "
                      f"(state saved)", flush=True)

    def report():
        import print_scores

        for dirs in (["data_setup_downsample1", "data_setup_downsample10"],
                     ["data_setup_downsample1"],
                     ["data_setup_downsample10"]):
            present = [d for d in dirs if os.path.isdir(d)]
            if present != dirs:
                continue
            sys.argv = ["print_scores.py"] + dirs
            print(f"[r4session] -- print_scores {' '.join(dirs)}",
                  flush=True)
            print_scores.main()
            break

    if not args.skip_bench:
        stage("bench-full", bench_full, est_s=300)
    if not args.skip_ds10:
        stage("10%-data paper grid", lambda: grid(10), est_s=600)
    if not args.skip_ds1:
        stage("100%-data paper grid", lambda: grid(1), est_s=600)
    if not args.skip_bscale:
        stage("seeded batch-scaling study", bscale, est_s=600)
    stage("report", report, always=True)

    real_failures = {k: v for k, v in failures.items()
                     if not v.startswith(("skipped", "budget"))}
    print(f"[r4session] done in {time.time() - t_start:.0f}s; "
          f"failures: {failures or 'none'}", flush=True)
    sys.exit(1 if real_failures else 0)


if __name__ == "__main__":
    main()
