"""Variant result visualization driver (reference
visualize_variation_results.py): ref/alt/difference structure grids and
molecule attention drawings per variant-drug pair."""
import pandas as pd
from caster_dta_tpu.analysis.visualize import visualize_variation_results

if __name__ == "__main__":
    ## USER INPUTS ##
    delta_file = "./pgx_results/default_run/pgx_delta_results.pkl"
    output_dir = "./pgx_results/default_run/figures"
    ## END USER INPUTS ##
    delta_df = pd.read_pickle(delta_file)
    outputs = visualize_variation_results(delta_df, output_dir)
    print(f"Wrote {len(outputs)} variant-drug figure pairs to {output_dir}")
