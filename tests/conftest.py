from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ves_spark.session import get_spark  # noqa: E402
from ves_spark.synth import write_fixture  # noqa: E402

N_FIXTURE_ROWS = 10_000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app_name="ves_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixture")
    write_fixture(str(d), N_FIXTURE_ROWS, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def seq_pdf(fixture_dir):
    import pandas as pd

    return pd.read_parquet(os.path.join(fixture_dir, "sequences.parquet"))


@pytest.fixture(scope="session")
def meta_pdf(fixture_dir):
    import pandas as pd

    return pd.read_parquet(os.path.join(fixture_dir, "source_meta.parquet"))


@pytest.fixture(scope="session")
def rules_pdf(fixture_dir):
    import pandas as pd

    return pd.read_parquet(os.path.join(fixture_dir, "route_rules.parquet"))


def assert_same_rows(actual_pdf, expected_pdf, sort_cols=None, float_cols=(), tol=1e-9):
    """Order-insensitive row-set equality (the driver's comparison model)."""
    import pandas as pd

    import numpy as np

    def norm(df):
        df = df.copy()
        for c in df.columns:
            if len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
                df[c] = df[c].map(tuple)
        return df

    a, e = norm(actual_pdf), norm(expected_pdf)
    assert sorted(a.columns) == sorted(e.columns), (sorted(a.columns), sorted(e.columns))
    cols = sorted(a.columns)
    a, e = a[cols], e[cols]
    sort_cols = sort_cols or [c for c in cols if c not in float_cols]
    a = a.sort_values(sort_cols, ignore_index=True)
    e = e.sort_values(sort_cols, ignore_index=True)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    for c in cols:
        if c in float_cols:
            import numpy as np

            assert np.allclose(a[c].astype(float), e[c].astype(float), atol=tol), c
        else:
            av, ev = a[c].tolist(), e[c].tolist()
            assert av == ev, f"column {c} differs, e.g. {next((x, y) for x, y in zip(av, ev) if x != y)}"
