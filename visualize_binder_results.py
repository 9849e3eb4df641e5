"""Binder-screen visualization driver (reference visualize_binder_results.py):
percentile filtering of predicted affinities + top-binder drawings."""
import pandas as pd
from caster_dta_tpu.analysis.visualize import visualize_binder_results

if __name__ == "__main__":
    ## USER INPUTS ##
    results_file = "./ad_results/default_run/ad_raw_results.pkl"
    output_dir = "./ad_results/default_run/figures"
    percentile = 99.0
    ## END USER INPUTS ##
    results_df = pd.read_pickle(results_file)
    top_df, drawn = visualize_binder_results(results_df, output_dir, percentile)
    print(f"{len(top_df)} pairs above the {percentile}th percentile; "
          f"{len(drawn)} drawings in {output_dir}")
