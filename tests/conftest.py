import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from engine.pipeline import tune_for_session

    tune_for_session()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts(tmp_path_factory):
    """FIXTURES.md F1 'tiny' corpus: ~50 convs, rows shuffled across
    conversations, written to parquet once per session."""
    import pyarrow.parquet as pq

    from engine.synth import make_transcripts_local

    t = make_transcripts_local(50, seed=42, shuffle=True)
    d = tmp_path_factory.mktemp("transcripts")
    path = str(d / "transcripts.parquet")
    pq.write_table(t, path)
    return path, t
