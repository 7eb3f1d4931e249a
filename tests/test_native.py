"""Native runtime tests: codec cross-check, CPU optimizer oracle, TCP
server round trips, and the remote→local fallback (SURVEY.md §2.2, §5).

The native library is built on demand from native/ (plain g++); every test
here skips if no toolchain is available.
"""

import asyncio

import numpy as np
import pytest

from toyslam_tpu.config import OptimizerConfig, SimConfig, SlamConfig
from toyslam_tpu.io import codec
from toyslam_tpu.io.client import GraphClient, optimize_with_fallback
from toyslam_tpu.optimizer import GaussNewton
from toyslam_tpu.sim import frontend

native = pytest.importorskip("toyslam_tpu.io.native")
if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def sim_and_graph():
    cfg = SlamConfig(sim=SimConfig(robot_steps=40, seed=0))
    sim = frontend.simulate(cfg.sim)
    graph, _ = frontend.build_graph(sim, cfg)
    return cfg, sim, graph


def _float_tolerant_bytes_equal(a: bytes, b: bytes):
    """Equal up to f32 ulp noise in trig-derived payload floats."""
    assert len(a) == len(b)
    au = np.frombuffer(a, np.uint32)
    bu = np.frombuffer(b, np.uint32)
    mism = au != bu
    if mism.any():
        af = np.frombuffer(a, np.float32)[mism]
        bf = np.frombuffer(b, np.float32)[mism]
        np.testing.assert_allclose(af, bf, rtol=1e-6, atol=1e-7)


def test_native_codec_matches_python_codec(sim_and_graph):
    _, _, graph = sim_and_graph
    py_bytes = codec.graph_to_bytes(graph)
    native_bytes = native.native_encode(graph)
    _float_tolerant_bytes_equal(py_bytes, native_bytes)

    # native decode of python bytes == python decode of python bytes
    g_native = native.native_decode(py_bytes)
    g_py = codec.bytes_to_graph(py_bytes)
    np.testing.assert_array_equal(
        np.asarray(g_native.poses), np.asarray(g_py.poses)
    )
    np.testing.assert_array_equal(
        np.asarray(g_native.landmarks), np.asarray(g_py.landmarks)
    )
    np.testing.assert_allclose(
        np.asarray(g_native.odom.meas), np.asarray(g_py.odom.meas),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(g_native.lm_edges.meas), np.asarray(g_py.lm_edges.meas)
    )
    np.testing.assert_array_equal(
        np.asarray(g_native.pose_fixed), np.asarray(g_py.pose_fixed)
    )


def test_native_optimizer_matches_jax_engine(sim_and_graph):
    """Cross-implementation oracle: the native CPU GN and the XLA GN solve
    the same problem to the same trajectory (within float/solver noise)."""
    cfg, sim, graph = sim_and_graph
    gt = np.asarray(sim.poses_gt)

    result_jax = GaussNewton(OptimizerConfig(solver="dense")).optimize(graph)
    g_native, stats = native.native_optimize(graph)

    n = gt.shape[0]
    ate_jax = frontend.ate_rmse(np.asarray(result_jax.graph.poses)[:n], gt)
    ate_native = frontend.ate_rmse(np.asarray(g_native.poses)[:n], gt)
    ate_dr = frontend.ate_rmse(np.asarray(sim.poses_dr), gt)

    assert stats.iterations_run >= 1
    assert stats.final_chi2 > 0
    # both must improve dead reckoning and agree closely with each other
    assert ate_native < 0.9 * ate_dr
    assert abs(ate_native - ate_jax) < 0.05 * max(ate_jax, 1e-3)
    np.testing.assert_allclose(
        np.asarray(g_native.poses)[:n],
        np.asarray(result_jax.graph.poses)[:n],
        atol=2e-2,
    )


def test_native_timing_report(sim_and_graph):
    _, _, graph = sim_and_graph
    native.timing_report(clear=True)
    native.native_optimize(graph)
    report = native.timing_report()
    assert "Optimize" in report
    assert "CalculateHb" in report and "Solve" in report
    count, total_ms = report["Optimize"]
    assert count >= 1 and total_ms > 0


def _client_round_trip(port: int, graph):
    async def go():
        client = GraphClient("127.0.0.1", port)
        await client.connect()
        try:
            out1 = await client.optimize(graph)
            out2 = await client.optimize(graph)  # session stays open
        finally:
            await client.close()
        return out1, out2

    return asyncio.run(go())


def test_native_server_native_backend(sim_and_graph):
    _, sim, graph = sim_and_graph
    gt = np.asarray(sim.poses_gt)
    n = gt.shape[0]
    with native.NativeServer(None, port=0) as server:
        out1, out2 = _client_round_trip(server.port, graph)
    ate = frontend.ate_rmse(np.asarray(out1.poses)[:n], gt)
    ate_dr = frontend.ate_rmse(np.asarray(sim.poses_dr), gt)
    assert ate < 0.9 * ate_dr
    np.testing.assert_array_equal(
        np.asarray(out1.poses), np.asarray(out2.poses)
    )
    # remote native result == in-process native result
    g_local, _ = native.native_optimize(graph)
    real = np.asarray(graph.pose_mask) > 0.5
    np.testing.assert_allclose(
        np.asarray(out1.poses)[real], np.asarray(g_local.poses)[real],
        rtol=1e-5, atol=1e-5,
    )


def test_native_server_jax_backend(sim_and_graph):
    from toyslam_tpu.io.server import native_server

    _, sim, graph = sim_and_graph
    gt = np.asarray(sim.poses_gt)
    n = gt.shape[0]
    server = native_server(
        backend="jax", cfg=OptimizerConfig(solver="dense"), port=0
    )
    with server:
        out, _ = _client_round_trip(server.port, graph)
    assert server.error is None
    ate = frontend.ate_rmse(np.asarray(out.poses)[:n], gt)
    ate_dr = frontend.ate_rmse(np.asarray(sim.poses_dr), gt)
    assert ate < 0.9 * ate_dr


def test_python_server_and_fallback(sim_and_graph):
    from toyslam_tpu.io.server import PyGraphServer, jax_optimize_fn

    _, sim, graph = sim_and_graph
    gt = np.asarray(sim.poses_gt)
    n = gt.shape[0]
    fn = jax_optimize_fn(OptimizerConfig(solver="dense"))

    with PyGraphServer(fn, port=0) as server:
        async def go():
            client = GraphClient("127.0.0.1", server.port)
            return await optimize_with_fallback(graph, client, fn)

        out, backend = asyncio.run(go())
    assert backend == "remote"
    ate = frontend.ate_rmse(np.asarray(out.poses)[:n], gt)
    assert ate < 0.9 * frontend.ate_rmse(np.asarray(sim.poses_dr), gt)

    # no server listening -> falls back to the local engine
    async def go_fallback():
        client = GraphClient("127.0.0.1", 1)  # nothing listens on port 1
        return await optimize_with_fallback(graph, client, fn)

    out2, backend2 = asyncio.run(go_fallback())
    assert backend2 == "local"
    ate2 = frontend.ate_rmse(np.asarray(out2.poses)[:n], gt)
    assert ate2 < 0.9 * frontend.ate_rmse(np.asarray(sim.poses_dr), gt)
