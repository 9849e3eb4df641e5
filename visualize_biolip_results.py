"""BioLIP result visualization driver (reference visualize_biolip_results.py):
binding vs non-binding attention paired t-tests, histograms, scatterplots."""
import pandas as pd
from caster_dta_tpu.analysis.visualize import visualize_biolip_results

if __name__ == "__main__":
    ## USER INPUTS ##
    results_file = "./biolip_results/default_run/biolip_raw_results.pkl"
    output_dir = "./biolip_results/default_run/figures"
    base_score = "attention"   # or "explanation" / "max_attention"
    ## END USER INPUTS ##
    results_df = pd.read_pickle(results_file)
    stats = visualize_biolip_results(results_df, output_dir, base_score)
    print(stats)
