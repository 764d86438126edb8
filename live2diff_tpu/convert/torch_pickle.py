"""Torch-free reader for torch pickle checkpoints (.pt / .ckpt / .bin).

The two mandatory weight artifacts of the reference pipeline are torch
pickles — ``live2diff.ckpt`` (motion module, consumed at
/root/reference/live2diff/animatediff/pipeline/pipeline_animatediff_depth.py:279-290)
and ``dpt_hybrid_384.pt`` (MiDaS, /root/reference/live2diff/animatediff/models/depth_utils.py:11-32).
A TPU serving host should not need a full torch install to ingest them, so
this module parses the format directly:

* **zip format** (torch >= 1.6 default): a zip archive holding
  ``<name>/data.pkl`` (a pickle whose tensors are persistent-id references)
  plus one raw little-endian storage blob per tensor under ``<name>/data/<key>``.
* **legacy format** (pre-1.6 ``_use_new_zipfile_serialization=False``): five
  consecutive pickles (magic, protocol, sys_info, the object, storage-key
  list) followed by ``int64 numel + raw bytes`` per storage.

Security model = torch's ``weights_only=True``: a restricted unpickler that
never imports or executes classes from the stream. Known tensor-rebuild
globals are mapped to local constructors; anything else resolves to an inert
placeholder (constructing it yields an opaque dummy, so unknown objects in a
checkpoint degrade to skipped entries instead of code execution).

Returns numpy arrays; bfloat16 storages are upcast to float32 (numpy has no
native bfloat16).
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np

# torch storage-class name -> (numpy dtype used for decoding, element size)
_STORAGE_DTYPES: Dict[str, tuple] = {
    "FloatStorage": (np.float32, 4),
    "DoubleStorage": (np.float64, 8),
    "HalfStorage": (np.float16, 2),
    "BFloat16Storage": (np.uint16, 2),  # decoded bit-pattern, upcast below
    "LongStorage": (np.int64, 8),
    "IntStorage": (np.int32, 4),
    "ShortStorage": (np.int16, 2),
    "CharStorage": (np.int8, 1),
    "ByteStorage": (np.uint8, 1),
    "BoolStorage": (np.bool_, 1),
    "ComplexFloatStorage": (np.complex64, 8),
    "ComplexDoubleStorage": (np.complex128, 16),
}

# torch.dtype names that may appear via UntypedStorage + _rebuild_tensor_v2's
# newer calling convention (torch >= 2.x saves still use typed storages, but
# torch.save of UntypedStorage-backed tensors references dtype globals)
_DTYPE_GLOBALS = {
    "float32": (np.float32, 4), "float64": (np.float64, 8),
    "float16": (np.float16, 2), "bfloat16": (np.uint16, 2),
    "int64": (np.int64, 8), "int32": (np.int32, 4),
    "int16": (np.int16, 2), "int8": (np.int8, 1),
    "uint8": (np.uint8, 1), "bool": (np.bool_, 1),
}


class _StorageType:
    """Stand-in for a torch storage class appearing in a persistent id."""

    def __init__(self, name: str):
        self.name = name

    @property
    def np_dtype(self):
        if self.name not in _STORAGE_DTYPES:
            raise pickle.UnpicklingError(f"unsupported torch storage type: {self.name}")
        return _STORAGE_DTYPES[self.name]


class _TorchDtype:
    """Stand-in for a ``torch.float32``-style dtype global."""

    def __init__(self, name: str):
        self.name = name


class _Opaque:
    """Inert placeholder for any global we do not recognise.

    Calling it, reducing it, or setting state on it is a no-op — unknown
    objects in a checkpoint become skippable dummies, never executed code.
    """

    def __init__(self, name: str = "?"):
        self._name = name

    def __call__(self, *a, **k):
        return _Opaque(self._name)

    def __setstate__(self, state):
        pass

    def __repr__(self):
        return f"<opaque {self._name}>"


class _LazyStorage:
    """A storage blob: decoded on demand from the archive."""

    def __init__(self, read: Any, dtype, itemsize: int, numel: int, is_bf16: bool):
        self._read = read  # () -> bytes
        self.dtype = dtype
        self.itemsize = itemsize
        self.numel = numel
        self.is_bf16 = is_bf16
        self._arr = None

    def array(self) -> np.ndarray:
        if self._arr is None:
            raw = self._read()
            arr = np.frombuffer(raw, dtype=self.dtype, count=self.numel)
            if self.is_bf16:
                # bfloat16 -> float32: bit pattern into the high half
                arr = (arr.astype(np.uint32) << 16).view(np.float32)
            self._arr = arr
        return self._arr


class _PendingTensor:
    """Legacy format: tensor rebuilt before its storage bytes are read."""

    def __init__(self, storage, offset, size, stride):
        self.storage, self.offset, self.size, self.stride = storage, offset, size, stride

    def materialize(self) -> np.ndarray:
        return _rebuild_tensor_v2(self.storage, self.offset, self.size, self.stride)


def _rebuild_tensor_v2(storage: _LazyStorage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    """Local equivalent of torch._utils._rebuild_tensor_v2 -> numpy array."""
    if not isinstance(storage, _LazyStorage):
        return _Opaque("tensor-without-storage")
    if storage._read is None:  # legacy: storage bytes come after the pickle
        return _PendingTensor(storage, storage_offset, size, stride)
    base = storage.array()
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if int(np.prod(size)) == 0:
        return np.empty(size, dtype=base.dtype)
    itemsize = base.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        base[int(storage_offset):],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


def _rebuild_from_type_v2(func, new_type, args, state):
    obj = func(*args)
    if state and isinstance(obj, np.ndarray) is False and hasattr(obj, "__setstate__"):
        obj.__setstate__(state)
    return obj


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): dict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): lambda storage, offset, size, stride: (
        _rebuild_tensor_v2(storage, offset, size, stride)
    ),
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch._tensor", "_rebuild_from_type_v2"): _rebuild_from_type_v2,
    ("torch.serialization", "_get_layout"): lambda name: _Opaque(name),
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, file: BinaryIO, load_storage):
        super().__init__(file, encoding="utf-8")
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        key = (module, name)
        if key in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[key]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch" and name in _DTYPE_GLOBALS:
            return _TorchDtype(name)
        if module == "torch.storage" and name == "TypedStorage":
            return _Opaque("TypedStorage")
        # anything else: inert placeholder (weights_only semantics — the
        # stream cannot make us import or execute arbitrary code)
        return _Opaque(f"{module}.{name}")

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel)
        if not (isinstance(pid, tuple) and len(pid) >= 5 and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        if isinstance(storage_type, _StorageType):
            np_dtype, itemsize = storage_type.np_dtype
            is_bf16 = storage_type.name == "BFloat16Storage"
        elif isinstance(storage_type, _TorchDtype):
            np_dtype, itemsize = _DTYPE_GLOBALS[storage_type.name]
            is_bf16 = storage_type.name == "bfloat16"
        else:
            raise pickle.UnpicklingError(f"unsupported storage type in pid: {pid!r}")
        return self._load_storage(str(key), np_dtype, itemsize, int(numel), is_bf16)


# ---------------------------------------------------------------------------
# zip format (torch >= 1.6)
# ---------------------------------------------------------------------------


def _load_zip(path: str) -> Any:
    zf = zipfile.ZipFile(path, "r")
    names = zf.namelist()
    pkl_name = next((n for n in names if n.endswith("/data.pkl") or n == "data.pkl"), None)
    if pkl_name is None:
        raise pickle.UnpicklingError(f"{path}: no data.pkl in archive")
    prefix = pkl_name[: -len("data.pkl")]

    def load_storage(key, np_dtype, itemsize, numel, is_bf16):
        member = f"{prefix}data/{key}"
        return _LazyStorage(lambda m=member: zf.read(m), np_dtype, itemsize, numel, is_bf16)

    with zf.open(pkl_name) as f:
        return _RestrictedUnpickler(io.BytesIO(f.read()), load_storage).load()


# ---------------------------------------------------------------------------
# legacy format (pre-1.6)
# ---------------------------------------------------------------------------

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _load_legacy(f: BinaryIO) -> Any:
    magic = pickle.load(f)
    if magic != _LEGACY_MAGIC:
        raise pickle.UnpicklingError("not a legacy torch file (bad magic)")
    pickle.load(f)  # protocol version
    pickle.load(f)  # sys info

    storages: Dict[str, _LazyStorage] = {}
    deferred: list = []

    def load_storage(key, np_dtype, itemsize, numel, is_bf16):
        if key not in storages:
            storages[key] = _LazyStorage(None, np_dtype, itemsize, numel, is_bf16)
            deferred.append(key)
        return storages[key]

    result = _RestrictedUnpickler(f, load_storage).load()

    # tail: pickled list of storage keys in write order, then per key
    # int64 numel + raw bytes
    keys = pickle.load(f)
    for key in keys:
        (numel,) = struct.unpack("<q", f.read(8))
        st = storages[str(key)]
        raw = f.read(numel * st.itemsize)
        st._read = lambda raw=raw: raw
        st.numel = numel
    return _materialize(result)


def _materialize(obj: Any) -> Any:
    """Resolve _PendingTensor placeholders now that storage bytes exist."""
    if isinstance(obj, _PendingTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def load_torch_pickle(path: str) -> Any:
    """Load a torch-serialized object without torch.

    Tensors come back as contiguous numpy arrays (bfloat16 upcast to
    float32); unknown objects degrade to inert placeholders the caller can
    filter out.
    """
    if zipfile.is_zipfile(path):
        return _load_zip(path)
    with open(path, "rb") as f:
        return _load_legacy(f)
