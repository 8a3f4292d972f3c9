"""Session-scoped Ray fixture: ONE ray.init for the whole pytest run."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level=logging.ERROR)
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts():
    """Deterministic 150-conversation transcript table (FIXTURES.md §A tiny)."""
    from cuttana_ray.sources.transcripts import synth_transcripts_table
    return synth_transcripts_table(150)


@pytest.fixture(scope="session")
def tiny_graph(tiny_transcripts):
    import ray.data as rd
    from cuttana_ray.pipelines.graph import build_graph_from_transcripts
    g = build_graph_from_transcripts(
        rd.from_arrow(tiny_transcripts).repartition(5))
    return g


@pytest.fixture(scope="session")
def tiny_graph_pandas(tiny_graph):
    """(src, dst, weight) numpy arrays of the tiny graph for oracles."""
    et = tiny_graph.edges.to_pandas()
    return (et["src"].to_numpy(), et["dst"].to_numpy(),
            et["weight"].to_numpy())
