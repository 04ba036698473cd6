"""Serving-export round trips (ndcn_tpu/serve.py).

The reference has no serving/deployment story (SURVEY §5: checkpointing =
state_dicts inside its own results dicts); these tests pin the TPU-native
one: the full inference forward exports to a StableHLO artifact whose loaded
callable matches the in-process forward to float tolerance (the lowering may
reassociate one-ULP differently than a fresh jit).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.sparse as sp

from ndcn_tpu.graph import generators, operators
from ndcn_tpu.graph.sparse import as_operator, from_dense
from ndcn_tpu.models import init_ndcn, ndcn_forward
from ndcn_tpu.serve import (export_ndcn, load_artifact, load_ndcn,
                            save_artifact)


def _problem(fmt):
    adj = generators.build_network("grid", 100, seed=0)
    dense = operators.normalized_laplacian(adj)
    op = (from_dense(dense) if fmt == "dense"
          else as_operator(sp.csr_matrix(dense), sparse=True, format=fmt))
    params = init_ndcn(jax.random.PRNGKey(0), 1, 20, 1)
    vt = jnp.linspace(0.0, 1.0, 8)
    x = jnp.asarray(np.random.RandomState(1).rand(100, 1), np.float32)
    return params, op, vt, x


@pytest.mark.parametrize("fmt", ["dense", "coo"])
def test_export_roundtrip(fmt):
    params, op, vt, x = _problem(fmt)
    kw = dict(rtol=0.01, atol=0.001, method="dopri5")
    blob = export_ndcn(params, op, vt, x.shape, **kw)
    assert isinstance(blob, bytes) and len(blob) > 0
    out, succ = load_ndcn(blob)(x)
    ref, stats = ndcn_forward(params, op, vt, x, nondiff=True, **kw)
    assert bool(succ) and bool(stats.success)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_export_terminal_classifier(tmp_path):
    # the dgnn serving shape: frozen grid, terminal state -> logits
    params, op, vt, x = _problem("dense")
    blob = export_ndcn(params, op, vt, x.shape, terminal=True,
                       rtol=0.1, atol=0.1, method="dopri5")
    path = str(tmp_path / "model.ndcnx")
    save_artifact(path, blob)
    out, succ = load_ndcn(load_artifact(path))(x)
    ref, _ = ndcn_forward(params, op, vt, x, terminal=True, nondiff=True,
                          rtol=0.1, atol=0.1, method="dopri5")
    assert out.shape == (100, 1) and bool(succ)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_export_forces_inference_path():
    # nondiff passed by the caller must not break (it is forced internally)
    params, op, vt, x = _problem("dense")
    blob = export_ndcn(params, op, vt, x.shape, nondiff=False,
                       rtol=0.01, atol=0.001, method="dopri5")
    out, succ = load_ndcn(blob)(x)
    assert bool(succ) and np.isfinite(np.asarray(out)).all()


def test_dgnn_export_flag(tmp_path):
    """--export on the dgnn driver: train briefly, serialize, and the loaded
    artifact's logits reproduce the trained model's test accuracy."""
    from ndcn_tpu.data import load_planetoid
    from ndcn_tpu.experiments import dgnn
    from ndcn_tpu.serve import load_artifact, load_ndcn
    from ndcn_tpu.train.losses import accuracy

    path = str(tmp_path / "cora.ndcnx")
    summary = dgnn.main(["--dataset", "cora", "--model", "differential_gcn",
                         "--epochs", "3", "--hidden", "16", "--T", "1.2",
                         "--time_tick", "4", "--dropout", "0", "--no_control",
                         "--seed", "0", "--export", path, "--platform", "cpu"])
    assert summary["export"] == path
    data = load_planetoid("cora", alpha=0.5)
    logits, succ = load_ndcn(load_artifact(path))(data.features)
    assert bool(succ)
    acc = float(accuracy(logits[data.idx_test], data.labels[data.idx_test]))
    ref = summary["rows"][-1][2]
    # the driver's eval uses the differentiable scan path, the artifact the
    # while-loop path: identical math, but a one-ULP reassociation can flip a
    # borderline node's argmax after only 3 epochs — allow a few of the 1000
    # test nodes to differ rather than flake
    assert abs(acc - ref) < 0.01, (acc, ref)


def test_dgnn_export_rejects_unsupported():
    import pytest
    from ndcn_tpu.experiments import dgnn

    with pytest.raises(SystemExit):
        dgnn.main(["--model", "GCN", "--export", "/tmp/x.ndcnx",
                   "--platform", "cpu"])
    with pytest.raises(SystemExit):
        dgnn.main(["--model", "differential_gcn", "--batch_iters",
                   "--export", "/tmp/x.ndcnx", "--platform", "cpu"])


def test_dynamics_export_flag(tmp_path):
    """--export on the dynamics driver: the artifact predicts the trajectory
    over the run's full observation grid from x0 alone."""
    from ndcn_tpu.experiments import dynamics
    from ndcn_tpu.serve import load_artifact, load_ndcn

    path = str(tmp_path / "heat.ndcnx")
    res = dynamics.run("heat", dynamics.build_parser("heat").parse_args(
        ["--network", "grid", "--n", "100", "--time_tick", "20",
         "--niters", "10", "--test_freq", "5", "--method", "dopri5",
         "--seed", "0", "--export", path, "--platform", "cpu"]))
    assert res["export"] == path
    out, succ = load_ndcn(load_artifact(path))(
        np.zeros((100, 1), np.float32) + 5.0)
    assert bool(succ)
    # irregular sampling draws 1.2x time_tick observation times (sampling.py)
    assert out.shape[0] == 24 and np.isfinite(np.asarray(out)).all()


def test_artifact_loads_without_ndcn_tpu(tmp_path):
    """The serving claim, literally: a FRESH python process that never imports
    ndcn_tpu deserializes the artifact and reproduces the trajectory."""
    import subprocess
    import sys

    params, op, vt, x = _problem("dense")
    blob = export_ndcn(params, op, vt, x.shape,
                       rtol=0.01, atol=0.001, method="dopri5")
    path = str(tmp_path / "m.ndcnx")
    save_artifact(path, blob)
    ref, _ = ndcn_forward(params, op, vt, x, nondiff=True,
                          rtol=0.01, atol=0.001, method="dopri5")
    np.save(str(tmp_path / "x.npy"), np.asarray(x))
    np.save(str(tmp_path / "ref.npy"), np.asarray(ref))
    code = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
assert "ndcn_tpu" not in sys.modules
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from jax import export
exp = export.deserialize(bytearray(open({path!r}, "rb").read()))
out, succ = exp.call(np.load({str(tmp_path / 'x.npy')!r}))
assert bool(succ)
ref = np.load({str(tmp_path / 'ref.npy')!r})
np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=1e-5)
assert "ndcn_tpu" not in sys.modules
print("SERVED-WITHOUT-NDCN-TPU")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SERVED-WITHOUT-NDCN-TPU" in r.stdout
