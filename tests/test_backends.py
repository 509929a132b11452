"""Executed coverage for the import-guarded torch / onnxruntime
backends (core/model.py) — neither library exists in this sandbox, so
the dispatch logic and the backend tensor math run against FAKES:

* fake torch = a ~100-line numpy-backed tensor shim implementing
  exactly the ops TorchUIE uses. This executes the real TorchUIE
  forward (views, transposes, masking, softmax, layer_norm, gelu,
  keep-mask) and asserts it agrees with the numpy forward at the
  reference's conversion tolerance (atol 1e-5, export_model.py:110);
* fake onnxruntime = an InferenceSession stub recording constructor
  and run() feeds, proving resolve_artifact wiring, input names, the
  post-session keep-mask, and cache keying.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from uie_pytorch_spark.core import model as M


# ---------------------------------------------------------------------
# numpy-backed torch shim
# ---------------------------------------------------------------------

def _as(v):
    return v.a if isinstance(v, _T) else v


class _T:
    def __init__(self, a):
        self.a = np.asarray(a)

    # movement / identity
    def to(self, dev):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self.a

    def float(self):
        return _T(self.a.astype(np.float32))

    @property
    def shape(self):
        return self.a.shape

    # indexing (int-array tensors, slices, None-axis)
    def __getitem__(self, idx):
        if isinstance(idx, _T):
            idx = idx.a
        elif isinstance(idx, tuple):
            idx = tuple(_as(x) for x in idx)
        return _T(self.a[idx])

    # shape ops (torch semantics)
    def view(self, *shape):
        return _T(self.a.reshape(shape))

    def reshape(self, *shape):
        return _T(self.a.reshape(shape))

    def transpose(self, d0, d1):
        return _T(np.swapaxes(self.a, d0, d1))

    # arithmetic
    def __matmul__(self, o):
        return _T(self.a @ _as(o))

    def __add__(self, o):
        return _T(self.a + _as(o))

    __radd__ = __add__

    def __mul__(self, o):
        return _T(self.a * _as(o))

    __rmul__ = __mul__

    def __truediv__(self, o):
        return _T(self.a / _as(o))

    def __eq__(self, o):  # noqa: A003 - tensor semantics, not hashing
        return _T(self.a == _as(o))

    def __or__(self, o):
        return _T(self.a | _as(o))

    def __invert__(self):
        return _T(~self.a)

    __hash__ = None


def _fake_torch(cuda_available: bool = False):
    t = types.ModuleType("torch")
    t.from_numpy = lambda a: _T(a)
    t.tensor = lambda v, device=None: _T(np.asarray(v))
    t.where = lambda c, x, y: _T(np.where(_as(c), _as(x), _as(y)))
    t.softmax = lambda x, dim: _T(
        np.exp(_as(x) - _as(x).max(axis=dim, keepdims=True))
        / np.exp(_as(x) - _as(x).max(axis=dim, keepdims=True)).sum(
            axis=dim, keepdims=True
        )
    )
    t.sigmoid = lambda x: _T(1.0 / (1.0 + np.exp(-_as(x))))

    def no_grad():
        def deco(fn):
            return fn

        return deco

    t.no_grad = no_grad

    cuda = types.SimpleNamespace(is_available=lambda: cuda_available)
    t.cuda = cuda

    def layer_norm(x, shape, g, b, eps):
        a = _as(x)
        mu = a.mean(axis=-1, keepdims=True)
        var = a.var(axis=-1, keepdims=True)
        return _T(((a - mu) / np.sqrt(var + eps)) * _as(g) + _as(b))

    def gelu(x, approximate="none"):
        assert approximate == "tanh"
        a = _as(x)
        c = 0.7978845608028654
        return _T(0.5 * a * (1.0 + np.tanh(c * (a + 0.044715 * a ** 3))))

    t.nn = types.SimpleNamespace(
        functional=types.SimpleNamespace(layer_norm=layer_norm, gelu=gelu)
    )
    return t


def _sample_batch(tok_len=20, L=24, B=3):
    rng = np.random.default_rng(4)
    ids = rng.integers(3, 200, size=(B, L)).astype(np.int64)
    ids[:, 0] = 1  # CLS
    ids[:, 10] = 2  # SEP
    am = np.ones((B, L), dtype=np.int64)
    am[:, tok_len:] = 0
    ids[:, tok_len:] = 0
    tt = np.zeros((B, L), dtype=np.int64)
    tt[:, 11:tok_len] = 1
    return ids, tt, am


@pytest.fixture(autouse=True)
def _clear_model_cache():
    M._CACHE.clear()
    yield
    M._CACHE.clear()


def test_torch_backend_matches_numpy_forward(monkeypatch):
    monkeypatch.setitem(sys.modules, "torch", _fake_torch())
    base = M.TinyUIE(seed=99)
    tm = M._torch_backend(base)
    assert tm._dev == "cpu"  # cuda.is_available() False -> cpu fallback
    ids, tt, am = _sample_batch()
    s_np, e_np = base.forward(ids, tt, am)
    s_t, e_t = tm.forward(ids, tt, am)
    assert s_t.dtype == np.float32 and s_t.shape == s_np.shape
    # reference's own conversion tolerance (export_model.py:110)
    np.testing.assert_allclose(s_t, s_np, atol=1e-5)
    np.testing.assert_allclose(e_t, e_np, atol=1e-5)
    # keep-mask: pads and CLS/SEP are exact zeros in both
    assert (s_t[:, 0] == 0).all() and (s_t[:, 10] == 0).all()
    assert (s_t[am == 0] == 0).all()


def test_torch_backend_cuda_device_selection(monkeypatch):
    monkeypatch.setitem(sys.modules, "torch", _fake_torch(cuda_available=True))
    tm = M._torch_backend(M.TinyUIE(seed=99))
    assert tm._dev == "cuda"


def test_get_model_torch_dispatch_and_cache(monkeypatch):
    monkeypatch.setitem(sys.modules, "torch", _fake_torch())
    m1 = M.get_model(seed=123, backend="torch")
    m2 = M.get_model(seed=123, backend="torch")
    m3 = M.get_model(seed=123, backend="numpy")
    assert m1 is m2  # singleton per (seed, path, backend)
    assert m3 is not m1 and isinstance(m3, M.TinyUIE)
    assert type(m1).__name__ == "TorchUIE"


# ---------------------------------------------------------------------
# onnxruntime fake
# ---------------------------------------------------------------------

def _fake_ort(record):
    ort = types.ModuleType("onnxruntime")

    class InferenceSession:
        def __init__(self, path, providers=None):
            record["path"] = path
            record["providers"] = providers

        def run(self, outputs, feeds):
            record["output_arg"] = outputs
            record["feeds"] = feeds
            B, L = feeds["input_ids"].shape
            # raw UNMASKED probabilities everywhere: the backend must
            # apply the keep-mask itself
            return (
                np.full((B, L), 0.9, dtype=np.float64),
                np.full((B, L), 0.8, dtype=np.float64),
            )

    ort.InferenceSession = InferenceSession
    return ort


def test_onnx_backend_session_wiring_and_keep_mask(monkeypatch, tmp_path):
    record = {}
    monkeypatch.setitem(sys.modules, "onnxruntime", _fake_ort(record))
    art = tmp_path / "uie.onnx"
    art.write_bytes(b"fake-onnx")

    m = M.get_model(backend="onnx", model_path=str(art))
    assert record["path"] == str(art)  # resolve_artifact: local path used
    assert record["providers"] == ["CPUExecutionProvider"]

    ids, tt, am = _sample_batch()
    s, e = m.forward(ids, tt, am)
    assert record["output_arg"] is None
    assert set(record["feeds"]) == {
        "input_ids", "token_type_ids", "attention_mask",
    }  # reference input names (uie_predictor.py:178-189)
    assert s.dtype == np.float32 and e.dtype == np.float32
    # keep-mask applied post-session: pads + CLS/SEP zeroed, rest kept
    assert (s[am == 0] == 0).all() and (e[am == 0] == 0).all()
    assert (s[:, 0] == 0).all() and (s[:, 10] == 0).all()
    real = (am == 1) & (ids != 1) & (ids != 2)
    np.testing.assert_allclose(s[real], 0.9, atol=1e-6)
    np.testing.assert_allclose(e[real], 0.8, atol=1e-6)


def test_onnx_backend_requires_model_path():
    with pytest.raises(ValueError, match="requires model_path"):
        M.get_model(backend="onnx")


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="backend"):
        M.get_model(backend="tpu")


def test_onnx_artifact_resolved_via_sparkfiles(monkeypatch, tmp_path):
    """A non-local model_path must be resolved through SparkFiles
    staging (the --files / addFile ship path)."""
    record = {}
    monkeypatch.setitem(sys.modules, "onnxruntime", _fake_ort(record))
    staged = tmp_path / "shipped.onnx"
    staged.write_bytes(b"fake")

    import pyspark

    monkeypatch.setattr(
        pyspark.SparkFiles, "get", staticmethod(lambda n: str(tmp_path / n))
    )
    m = M.get_model(backend="onnx", model_path="/nonexistent/dir/shipped.onnx")
    assert record["path"] == str(staged)
    assert m is M.get_model(backend="onnx", model_path="/nonexistent/dir/shipped.onnx")
