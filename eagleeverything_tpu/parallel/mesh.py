"""Mesh construction and sharding specs.

The primary partition is **SNP-sharding** (the tensor-parallel analog for
this workload, SURVEY.md §3.4): the SNP-major genotype matrix Wt (p, n) is
sharded on axis 0 over the ``snp`` mesh axis; the n×n decision algebra is
replicated. An optional ``ind`` axis shards the individuals dimension for
biobank-scale n (SURVEY.md §6.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SNP_AXIS = "snp"
IND_AXIS = "ind"


def make_mesh(
    mesh_shape: Optional[tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the (ind, snp) device mesh. Default: 1×N over all local devices
    — all devices on the SNP axis."""
    if devices is None:
        devices = jax.devices()
    if mesh_shape is not None:
        need = mesh_shape[0] * mesh_shape[1]
        if need <= len(devices):
            devices = devices[:need]  # explicit smaller mesh: use a subset
    n_dev = len(devices)
    if mesh_shape is None:
        mesh_shape = (1, n_dev)
    if mesh_shape[0] * mesh_shape[1] != n_dev:
        raise ValueError(f"mesh_shape {mesh_shape} != {n_dev} devices")
    arr = np.asarray(devices).reshape(mesh_shape)
    return Mesh(arr, (IND_AXIS, SNP_AXIS))


def snp_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for SNP-major arrays (p, n): rows split over ``snp``,
    individuals replicated (or split over ``ind`` when that axis > 1)."""
    if mesh.shape[IND_AXIS] > 1:
        return NamedSharding(mesh, P(SNP_AXIS, IND_AXIS))
    return NamedSharding(mesh, P(SNP_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
