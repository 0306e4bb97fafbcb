#!/usr/bin/env python
"""Run the nth experiment row of a CSV schedule (Slurm-array sweep driver).

Mirrors dt_segmentation/run_job.py: rows are keyed by a ``job`` column; array
ids beyond the row count cycle through seeds (seed, job = divmod(id, n_jobs),
random_state = (seed+1)*1234); per-experiment exceptions are printed, not
raised, so one bad row doesn't kill the array task.
"""
from __future__ import annotations

import argparse
import os

import pandas as pd

from dino_tpu.cli.run_experiment import run_experiment


def main():
    parser = argparse.ArgumentParser(
        description="Run experiments configured in a .csv schedule")
    parser.add_argument("--comet_tag", "-t", type=str, default=None)
    parser.add_argument("--job", "-j", type=int, default=0,
                        help="Schedule rows marked with this number run "
                             "sequentially; intended for the Slurm array id.")
    parser.add_argument("--config", "-c", type=str,
                        default=os.path.join(os.getcwd(), "exp_schedule",
                                             "main.csv"))
    parser.add_argument("--data_path", "-d", type=str,
                        default=os.path.join(os.getcwd(), "../data"))
    parser.add_argument("--write_path", "-w", type=str, default=os.getcwd())
    args = parser.parse_args()

    schedule = pd.read_csv(args.config)
    n_jobs = int(schedule["job"].max() + 1)

    seed, job_no = divmod(args.job, n_jobs)

    schedule = schedule.loc[schedule["job"] == job_no].drop(["job"], axis=1)
    if schedule.shape[0] == 0:
        raise Exception(f"No job marked with the following id : {args.job}.")

    for _, exp_params in schedule.iterrows():
        params = exp_params.dropna().to_dict()
        params["random_state"] = (seed + 1) * 1234
        params["data_path"] = args.data_path
        params["write_path"] = args.write_path
        params["comet_tag"] = args.comet_tag

        print("Running experiment using config : ")
        print(params)
        try:
            run_experiment(**params)
        except Exception as e:
            print(e)


if __name__ == "__main__":
    main()
