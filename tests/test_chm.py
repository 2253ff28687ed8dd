"""CHM height-rule tests (table-driven, pattern: reference tests/test_CHM.py)."""
import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu.data.chm import height_rules, non_zero_99_quantile


@pytest.mark.parametrize(
    "chm,height,kept",
    [
        (np.nan, 10.0, False),   # no CHM -> drop
        (10.0, np.nan, True),    # no field height -> keep
        (0.5, np.nan, True),     # no field height keeps even short CHM
        (0.5, 5.0, False),       # CHM below min height -> drop
        (12.0, 10.0, True),      # CHM above within max_CHM_diff
        (15.0, 10.0, False),     # CHM above by >= 4 -> drop
        (10.0, 12.0, True),      # CHM below within limit
        (10.0, 19.0, False),     # CHM below by >= 8 -> drop
        (10.0, 10.0, True),      # equal
    ],
)
def test_height_rules(chm, height, kept):
    df = pd.DataFrame({"CHM_height": [chm], "height": [height]})
    out = height_rules(df, min_CHM_height=1, max_CHM_diff=4, CHM_height_limit=8)
    assert (len(out) == 1) == kept


def test_non_zero_quantile():
    vals = np.array([0.0, 0.2, 5.0, 10.0, 12.0])
    q = non_zero_99_quantile(vals)
    assert 11.0 < q <= 12.0
    assert non_zero_99_quantile(np.array([0.0, 0.1])) is None
