"""Mesh and UV-texture data model (pytrees), plus static topology precompute.

TPU-native replacement for the PyTorch3D ``Meshes`` + ``TexturesUV`` structures
the reference builds in ``build_mesh`` (reference: utils.py:207-210) and
consumes throughout. Instead of an object graph that must be rebuilt every
optimizer step so autograd can see the leaf tensors (reference:
first_approach.py:194-195 "Done because pytorch otherwise cries"), a ``Mesh``
here is an immutable pytree: optimization produces new meshes functionally and
``jax.jit``/``jax.grad`` trace straight through it.

Topology needed by the mesh regularizer losses (unique edges, vertex degrees,
interior-edge face pairs — reference deps: pytorch3d.loss.mesh_edge_loss /
mesh_laplacian_smoothing / mesh_normal_consistency, imported at
losses.py:3) is precomputed **once** on the host with NumPy at mesh build time
and stored as fixed-shape integer arrays, so every loss is a static-shape
jitted reduction (segment_sum / gather) with no dynamic sparsity at trace time.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MeshTopology:
    """Static connectivity, precomputed host-side. Shapes fixed per mesh.

    Attributes:
      edges:     (E, 2) int32 — unique undirected edges, each row sorted
                 (v0 < v1), lexicographically ordered.
      degree:    (V,) float32 — number of edge-neighbors per vertex (vertices
                 not referenced by any face have degree 0).
      nc_pairs:  (P, 4) int32 — for every pair of faces sharing an interior
                 edge: (v0, v1, a, b) where (v0, v1) is the shared edge and
                 a, b are the opposite vertices in the two faces. All C(n,2)
                 pairs are emitted for non-manifold edges shared by n > 2
                 faces (matching pytorch3d.loss.mesh_normal_consistency).
    """

    edges: jnp.ndarray
    degree: jnp.ndarray
    nc_pairs: jnp.ndarray


@struct.dataclass
class Mesh:
    """A single triangle mesh with a UV-mapped texture.

    Equivalent capability to PyTorch3D ``Meshes(verts, faces,
    textures=TexturesUV(verts_uvs, faces_uvs, maps))`` (reference:
    utils.py:207-210) for the single-mesh case the reference uses.

    Attributes:
      verts:     (V, 3) float32 world-space vertex positions.
      faces:     (F, 3) int32 indices into ``verts``.
      verts_uvs: (Vt, 2) float32 UV coordinates; uv (0, 0) addresses the
                 BOTTOM-left of the texture image (PyTorch3D TexturesUV
                 convention — the V axis is flipped relative to image rows).
      faces_uvs: (F, 3) int32 indices into ``verts_uvs``.
      texture:   (H, W, 3) float32 texture atlas in [0, 1]; row 0 is the TOP
                 image row (so sampling uses y = (1 - v) * H).
      topology:  optional MeshTopology for regularizer losses.
    """

    verts: jnp.ndarray
    faces: jnp.ndarray
    verts_uvs: jnp.ndarray
    faces_uvs: jnp.ndarray
    texture: jnp.ndarray
    topology: Optional[MeshTopology] = None

    @property
    def num_verts(self) -> int:
        return self.verts.shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    def with_topology(self) -> "Mesh":
        """Return a copy carrying precomputed topology (no-op if present)."""
        if self.topology is not None:
            return self
        topo = compute_topology(
            np.asarray(self.faces), int(self.verts.shape[0])
        )
        return self.replace(topology=topo)


def compute_topology(faces: np.ndarray, num_verts: int) -> MeshTopology:
    """Host-side (NumPy) connectivity extraction; runs once per mesh.

    Mirrors the connectivity PyTorch3D derives lazily inside its loss
    functions (unique edges for mesh_edge_loss, neighbor sums for uniform
    Laplacian smoothing, shared-edge face pairs for normal consistency).
    """
    faces = np.asarray(faces, dtype=np.int64)
    if faces.ndim != 2 or faces.shape[1] != 3:
        raise ValueError(f"faces must be (F, 3), got {faces.shape}")

    # All directed edges with, per edge, the opposite vertex of its face.
    e01 = faces[:, [0, 1]]
    e12 = faces[:, [1, 2]]
    e20 = faces[:, [2, 0]]
    all_edges = np.concatenate([e01, e12, e20], axis=0)
    opposite = np.concatenate([faces[:, 2], faces[:, 0], faces[:, 1]], axis=0)

    all_edges_sorted = np.sort(all_edges, axis=1)
    edges, inverse = np.unique(all_edges_sorted, axis=0, return_inverse=True)
    inverse = inverse.reshape(-1)

    degree = np.zeros((num_verts,), dtype=np.float32)
    np.add.at(degree, edges.reshape(-1), 1.0)

    # Group opposite-vertices by edge id to form normal-consistency pairs.
    order = np.argsort(inverse, kind="stable")
    inv_sorted = inverse[order]
    opp_sorted = opposite[order]
    # Start offset of each edge's run in the sorted array.
    counts = np.bincount(inv_sorted, minlength=len(edges))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

    pairs = []
    # Vectorized fast path: edges shared by exactly two faces (the vast
    # majority for manifold meshes).
    two = np.nonzero(counts == 2)[0]
    if two.size:
        s = starts[two]
        pairs.append(
            np.stack(
                [edges[two, 0], edges[two, 1], opp_sorted[s], opp_sorted[s + 1]],
                axis=1,
            )
        )
    # Rare path: non-manifold edges shared by >2 faces — all pairs.
    many = np.nonzero(counts > 2)[0]
    for eid in many:
        s, n = starts[eid], counts[eid]
        opp = opp_sorted[s : s + n]
        for i in range(n):
            for j in range(i + 1, n):
                pairs.append(
                    np.array(
                        [[edges[eid, 0], edges[eid, 1], opp[i], opp[j]]],
                        dtype=np.int64,
                    )
                )
    if pairs:
        nc_pairs = np.concatenate(pairs, axis=0).astype(np.int32)
    else:
        nc_pairs = np.zeros((0, 4), dtype=np.int32)

    return MeshTopology(
        edges=jnp.asarray(edges, dtype=jnp.int32),
        degree=jnp.asarray(degree, dtype=jnp.float32),
        nc_pairs=jnp.asarray(nc_pairs),
    )


def build_mesh(verts_uvs, faces_uvs, texture_map, verts, faces,
               with_topology: bool = False) -> Mesh:
    """Assemble a Mesh; same argument order as the reference's ``build_mesh``
    (reference: utils.py:207-210). Accepts batched (1, ...) arrays as produced
    by the reference driver code and squeezes the leading singleton dim.
    """
    def _squeeze(a, rank):
        a = jnp.asarray(a)
        if a.ndim == rank + 1 and a.shape[0] == 1:
            a = a[0]
        if a.ndim != rank:
            raise ValueError(f"expected rank {rank} (or 1+{rank}), got {a.shape}")
        return a

    mesh = Mesh(
        verts=_squeeze(verts, 2).astype(jnp.float32),
        faces=_squeeze(faces, 2).astype(jnp.int32),
        verts_uvs=_squeeze(verts_uvs, 2).astype(jnp.float32),
        faces_uvs=_squeeze(faces_uvs, 2).astype(jnp.int32),
        texture=_squeeze(texture_map, 3).astype(jnp.float32),
    )
    if with_topology:
        mesh = mesh.with_topology()
    return mesh


def finalize_mesh(mesh: Mesh) -> Mesh:
    """Clamp the texture to [0, 1] (reference: utils.py:94-118). The reference
    also detaches; pytrees have no graph to detach."""
    return mesh.replace(texture=jnp.clip(mesh.texture, 0.0, 1.0))


def face_vertex_normals(mesh: Mesh) -> jnp.ndarray:
    """Per-face (unnormalized) normals via the cross product; (F, 3)."""
    v = mesh.verts[mesh.faces]  # (F, 3, 3)
    return jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
