"""Small shared utilities (reference src/utils.py:86-93)."""
import numpy as np
import pandas as pd


def predictions_to_df(predictions):
    """List of (individuals, scores) batches -> long DataFrame."""
    individuals = np.concatenate([np.asarray(x[0]) for x in predictions])
    scores = np.concatenate([np.asarray(x[1]) for x in predictions])
    # reshape, not squeeze: squeeze would collapse the batch axis of a
    # single-row score matrix and misalign the frame
    df = pd.DataFrame(scores.reshape(len(individuals), -1))
    df["individual"] = individuals
    return df
