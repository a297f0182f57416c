"""Pure-numpy reader/writer for PyTorch zip checkpoints (the NCRF++
``.model`` format: ``torch.save(model.state_dict(), path)``), so the
neural slot is exercisable in torch-less environments (VERDICT r4 #5).

The post-1.6 torch.save layout is a zip archive::

    archive/data.pkl      pickled object graph; each tensor is
                          torch._utils._rebuild_tensor_v2(storage,
                          offset, size, stride, requires_grad, hooks)
                          with the storage a pickle PERSISTENT ID
                          ('storage', <StorageType>, key, location,
                          numel)
    archive/data/<key>    the raw little-endian storage bytes
    archive/version       serialization version

``load_state_dict`` implements that protocol with a custom Unpickler:
persistent ids resolve to numpy arrays read from the zip members,
``_rebuild_tensor_v2`` becomes an as_strided view + copy, and every
``torch.*`` global resolves to a local stub — no torch import anywhere.

``save_state_dict`` writes the same layout (storages deduplicated by
id, one per tensor here), so engine-trained weights export to a file
a real NCRF++/torch environment can ``torch.load`` directly — the
round trip is the compatibility test.

Reference cites: NCRF++ state-dict key layout from
/root/reference/model/seqlabel.py:31-33 (``word_hidden.*``,
``crf.transitions``), model/wordsequence.py:14-112,
model/wordrep.py:15-119, model/charcnn.py:12-74.
"""

from __future__ import annotations

import io
import pickle
import sys
import types
import zipfile
from collections import OrderedDict

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}
_STORAGE_OF = {np.dtype(v): k for k, v in _DTYPES.items()}


class _StorageType:
    """Stand-in for torch.FloatStorage & friends inside the pickle."""

    def __init__(self, name: str) -> None:
        self.name = name
        self.dtype = _DTYPES.get(name)


def _rebuild_tensor_v2(storage: np.ndarray, storage_offset: int,
                       size: tuple, stride: tuple, *unused) -> np.ndarray:
    if not size:
        return np.asarray(storage[storage_offset]).copy()
    itemsize = storage.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        storage[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return view.copy()


def _rebuild_parameter(data: np.ndarray, *unused) -> np.ndarray:
    return data


class _Unpickler(pickle.Unpickler):
    def __init__(self, fh, zf: zipfile.ZipFile, prefix: str) -> None:
        super().__init__(fh)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if module.startswith("torch"):
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
            if name in _DTYPES:
                return _StorageType(name)
            raise pickle.UnpicklingError(
                f"unsupported torch global in checkpoint: {module}.{name}")
        if (module, name) in (("collections", "OrderedDict"),
                              ("builtins", "dict")):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"disallowed global in checkpoint: {module}.{name}")

    def persistent_load(self, pid):
        tag, stype, key, _location, numel = pid
        if tag != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id tag {tag}")
        dtype = stype.dtype if isinstance(stype, _StorageType) else None
        if dtype is None:
            raise pickle.UnpicklingError(f"unknown storage type {stype}")
        raw = self._zf.read(f"{self._prefix}/data/{key}")
        arr = np.frombuffer(raw, dtype=dtype, count=int(numel))
        return arr


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """torch-zip checkpoint -> {name: numpy array}, no torch needed."""
    with zipfile.ZipFile(path) as zf:
        pkl = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl:
            raise ValueError(
                f"{path}: not a torch zip checkpoint (no data.pkl; the "
                "pre-1.6 legacy pickle format is not supported — "
                "re-save with a modern torch)")
        prefix = pkl[0][: -len("/data.pkl")]
        with zf.open(pkl[0]) as fh:
            obj = _Unpickler(io.BytesIO(fh.read()), zf, prefix).load()
    if not isinstance(obj, (dict, OrderedDict)):
        raise ValueError(f"{path}: checkpoint root is {type(obj)}, "
                         "expected a state dict")
    return {str(k): np.asarray(v) for k, v in obj.items()}


def save_state_dict(path: str, state: dict[str, np.ndarray]) -> None:
    """Write {name: numpy array} as a torch-zip checkpoint that a real
    ``torch.load`` accepts. Temporarily registers stub ``torch``
    modules in sys.modules so the pickler can emit the
    ``torch._utils._rebuild_tensor_v2`` / ``torch.FloatStorage``
    globals by reference (pickle verifies globals by import at dump
    time); the stubs are removed afterwards and never shadow a real
    torch (guarded)."""
    for mod in ("torch", "torch._utils"):
        if mod in sys.modules and not getattr(
                sys.modules[mod], "_graft_stub", False):
            raise RuntimeError(
                "real torch is importable — use torch.save instead of "
                "the numpy writer")

    storages: list[tuple[str, bytes]] = []

    class _TensorProxy:
        def __init__(self, arr: np.ndarray) -> None:
            self.arr = np.ascontiguousarray(arr)

        def __reduce_ex__(self, protocol):
            a = self.arr
            key = str(len(storages))
            storages.append((key, a.tobytes()))
            stype = getattr(sys.modules["torch"],
                            _STORAGE_OF[a.dtype])
            pid = _Pers(("storage", stype, key, "cpu", int(a.size)))
            stride = tuple(s // a.itemsize for s in a.strides)
            return (sys.modules["torch._utils"]._rebuild_tensor_v2,
                    (pid, 0, a.shape, stride, False, OrderedDict()))

    class _Pers:
        def __init__(self, pid) -> None:
            self.pid = pid

    class _Pickler(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, _Pers):
                return obj.pid
            return None

    stubs = {}
    try:
        t = types.ModuleType("torch")
        tu = types.ModuleType("torch._utils")
        t._graft_stub = tu._graft_stub = True

        def _stub_rebuild(*a, **k):  # never called; pickled by ref
            raise NotImplementedError

        _stub_rebuild.__module__ = "torch._utils"
        _stub_rebuild.__qualname__ = "_rebuild_tensor_v2"
        _stub_rebuild.__name__ = "_rebuild_tensor_v2"
        tu._rebuild_tensor_v2 = _stub_rebuild
        for sname in _DTYPES:
            cls = type(sname, (), {"__module__": "torch",
                                   "__qualname__": sname})
            setattr(t, sname, cls)
        t._utils = tu
        stubs = {"torch": t, "torch._utils": tu}
        sys.modules.update(stubs)

        od = OrderedDict((k, _TensorProxy(np.asarray(v)))
                         for k, v in state.items())
        buf = io.BytesIO()
        _Pickler(buf, protocol=2).dump(od)
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
            zf.writestr("archive/data.pkl", buf.getvalue())
            for key, raw in storages:
                zf.writestr(f"archive/data/{key}", raw)
            zf.writestr("archive/version", "3\n")
    finally:
        for mod in stubs:
            sys.modules.pop(mod, None)
