"""Data type registry for the TPU runtime.

Mirrors the capability surface of the reference dtype registry
(reference: src/pygpukit/core/dtypes.py:10-123) but is built around JAX's
native dtype system: bfloat16 / fp8 are first-class on TPU (no uint16
bit-twiddling needed), and int4 is a real packed JAX dtype.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


class DataTypeKind(enum.Enum):
    FLOAT = "float"
    INT = "int"
    UINT = "uint"
    BOOL = "bool"


@dataclass(frozen=True)
class DataType:
    """A dtype descriptor bridging numpy and JAX representations."""

    name: str
    kind: DataTypeKind
    itemsize: float  # bytes per element (0.5 for packed 4-bit types)
    jax_dtype: jnp.dtype
    # numpy-visible dtype used when materialising to host memory. For types
    # numpy cannot represent natively (bf16, fp8, int4) ml_dtypes (vendored by
    # jax) provides a real numpy dtype, so this is always a usable np.dtype.
    np_dtype: np.dtype

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"DataType({self.name})"

    def __str__(self) -> str:
        return self.name

    @property
    def is_floating(self) -> bool:
        return self.kind is DataTypeKind.FLOAT

    @property
    def is_integer(self) -> bool:
        return self.kind in (DataTypeKind.INT, DataTypeKind.UINT)

    @property
    def bits(self) -> int:
        return int(self.itemsize * 8)


def _dt(name: str, kind: DataTypeKind, itemsize: float, jdt) -> DataType:
    return DataType(
        name=name,
        kind=kind,
        itemsize=itemsize,
        jax_dtype=jnp.dtype(jdt),
        np_dtype=np.dtype(jdt),
    )


float64 = _dt("float64", DataTypeKind.FLOAT, 8, jnp.float64)
float32 = _dt("float32", DataTypeKind.FLOAT, 4, jnp.float32)
float16 = _dt("float16", DataTypeKind.FLOAT, 2, jnp.float16)
bfloat16 = _dt("bfloat16", DataTypeKind.FLOAT, 2, jnp.bfloat16)
float8_e4m3 = _dt("float8_e4m3", DataTypeKind.FLOAT, 1, jnp.float8_e4m3fn)
float8_e5m2 = _dt("float8_e5m2", DataTypeKind.FLOAT, 1, jnp.float8_e5m2)
int64 = _dt("int64", DataTypeKind.INT, 8, jnp.int64)
int32 = _dt("int32", DataTypeKind.INT, 4, jnp.int32)
int16 = _dt("int16", DataTypeKind.INT, 2, jnp.int16)
int8 = _dt("int8", DataTypeKind.INT, 1, jnp.int8)
int4 = _dt("int4", DataTypeKind.INT, 0.5, jnp.int4)
uint8 = _dt("uint8", DataTypeKind.UINT, 1, jnp.uint8)
uint16 = _dt("uint16", DataTypeKind.UINT, 2, jnp.uint16)
uint32 = _dt("uint32", DataTypeKind.UINT, 4, jnp.uint32)
bool_ = _dt("bool", DataTypeKind.BOOL, 1, jnp.bool_)

# Aliases matching the reference naming (fp8 = e4m3 by default).
fp8 = float8_e4m3

_ALL = [
    float64, float32, float16, bfloat16, float8_e4m3, float8_e5m2,
    int64, int32, int16, int8, int4, uint8, uint16, uint32, bool_,
]
_BY_NAME: dict[str, DataType] = {d.name: d for d in _ALL}
_BY_NAME.update({
    "fp32": float32,
    "fp16": float16,
    "bf16": bfloat16,
    "fp8": float8_e4m3,
    "fp8_e4m3": float8_e4m3,
    "fp8_e5m2": float8_e5m2,
    "f32": float32,
    "f16": float16,
    "f64": float64,
})


def to_dtype(obj) -> DataType:
    """Coerce a DataType / string / numpy / jax dtype into a DataType."""
    if isinstance(obj, DataType):
        return obj
    if isinstance(obj, str):
        if obj in _BY_NAME:
            return _BY_NAME[obj]
        # fall through to numpy name resolution (e.g. "float8_e4m3fn")
    try:
        jdt = jnp.dtype(obj)
    except TypeError as e:  # pragma: no cover - defensive
        raise ValueError(f"unknown dtype: {obj!r}") from e
    for d in _ALL:
        if d.jax_dtype == jdt:
            return d
    raise ValueError(f"unsupported dtype: {obj!r}")


def all_dtypes() -> list[DataType]:
    return list(_ALL)
