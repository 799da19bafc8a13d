from __future__ import annotations

import pytest

from dedup.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def synth_rows():
    from dedup import synth

    return synth.generate(500, seed=42)


@pytest.fixture(scope="session")
def synth_parquet(tmp_path_factory, synth_rows):
    import pyarrow.parquet as pq

    from dedup import synth

    path = str(tmp_path_factory.mktemp("images") / "images.parquet")
    pq.write_table(synth.to_arrow(synth_rows), path)
    return path
