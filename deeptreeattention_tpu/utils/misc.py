"""Small shared utilities (reference src/utils.py:86-93)."""
import numpy as np
import pandas as pd


def predictions_to_df(predictions):
    """List of (individuals, scores) batches -> long DataFrame."""
    individuals = np.concatenate([np.asarray(x[0]) for x in predictions])
    scores = np.concatenate([np.asarray(x[1]) for x in predictions])
    df = pd.DataFrame(np.squeeze(scores))
    df["individual"] = individuals
    return df
