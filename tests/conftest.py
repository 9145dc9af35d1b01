import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmldb_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("openmldb_spark_tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4",
                              "spark.driver.memory": "8g"})
    yield s


def assert_pdf_allclose(got, exp, sort_by, float_cols=(), rtol=1e-6):
    """Order-insensitive frame comparison with float tolerance."""
    import numpy as np
    import pandas as pd

    got = got.sort_values(sort_by, kind="mergesort").reset_index(drop=True)
    exp = exp.sort_values(sort_by, kind="mergesort").reset_index(drop=True)
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    for c in exp.columns:
        assert c in got.columns, f"missing column {c}"
        g, e = got[c], exp[c]
        if c in float_cols or getattr(e.dtype, "kind", "") == "f":
            gn = pd.to_numeric(g, errors="coerce").to_numpy(np.float64)
            en = pd.to_numeric(e, errors="coerce").to_numpy(np.float64)
            both_nan = np.isnan(gn) & np.isnan(en)
            ok = both_nan | np.isclose(gn, en, rtol=rtol, equal_nan=False)
            assert ok.all(), f"col {c} mismatch at {np.where(~ok)[0][:10]}:\n" \
                f"got={gn[~ok][:10]} exp={en[~ok][:10]}"
        else:
            g2 = g.where(pd.notna(g), None).astype(object)
            e2 = e.where(pd.notna(e), None).astype(object)
            neq = [i for i in range(len(g2)) if _norm(g2[i]) != _norm(e2[i])]
            assert not neq, f"col {c} mismatch at rows {neq[:10]}: " \
                f"got={[g2[i] for i in neq[:5]]} exp={[e2[i] for i in neq[:5]]}"


def _norm(v):
    import numpy as np
    import pandas as pd
    if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NaT:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    import datetime
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v
