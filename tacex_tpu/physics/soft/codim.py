"""Codimensional (shell/cloth) finite elements as data + energy functions.

libuipc treats cloth as FiniteElement constitutions living in the SAME
system as tet elements (``NeoHookeanShell`` / ``DiscreteShellBending``
applied to trimesh geometry; reference
source/tacex_uipc/tacex_uipc/sim/uipc_sim.py:23-26 constitution list,
examples/libuipc-samples/11_bunny_cloth.py:72-79). This module makes that
shape available here: a :class:`ShellElements` bundle holds the
precomputed rest quantities of a set of membrane triangles + bending
hinges over an ARBITRARY vertex array, and the two energy functions below
evaluate them for any nodal solver that owns those vertices —
:class:`shell.ShellModel` standalone, or :class:`ipc.SoftBodyModel` when
cloth joins the union/coupled contact world (one nodal system, mixed tet
and codim elements, exactly the libuipc layout).

Kept import-free of ipc/shell so both can use it without cycles.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ShellElements:
    """Rest-state data of membrane triangles + bending hinges.

    Vertex ids (``tris``, ``hinges``) index whatever vertex array the
    owning solver solves over — local for a standalone shell, global
    (offset) inside a union model. ``masses`` is the lumped-mass
    CONTRIBUTION of these elements per owned vertex id (length = the
    owning vertex count), additive with tet lumped masses.
    """

    tris: np.ndarray  # (Tm, 3) int32
    d_inv: np.ndarray  # (Tm, 2, 2) inverse rest tangent matrix
    rest_area: np.ndarray  # (Tm,)
    mu: np.ndarray  # (Tm,) first Lamé (shear) modulus
    lam: np.ndarray  # (Tm,) second Lamé modulus
    thickness: np.ndarray  # (Tm,)
    masses: np.ndarray  # (V,) per-vertex lumped mass from these elements
    hinges: np.ndarray  # (H, 4) int32: edge a-b, opposite c, d
    hinge_w: np.ndarray  # (H,) bending weight kb * |e| / h_bar
    theta0: np.ndarray  # (H,) rest dihedral

    @property
    def num_tris(self) -> int:
        return self.tris.shape[0]


def _dihedral_np(P: np.ndarray, H: np.ndarray) -> np.ndarray:
    x0, x1, x2, x3 = P[H[:, 0]], P[H[:, 1]], P[H[:, 2]], P[H[:, 3]]
    e = x1 - x0
    n1 = np.cross(e, x2 - x0)
    n2 = np.cross(x3 - x0, e)
    n1n = np.linalg.norm(n1, axis=-1) + 1e-12
    n2n = np.linalg.norm(n2, axis=-1) + 1e-12
    en = np.linalg.norm(e, axis=-1) + 1e-12
    cos = (n1 * n2).sum(-1) / (n1n * n2n)
    sin = (np.cross(n1, n2) * e).sum(-1) / (n1n * n2n * en)
    return np.arctan2(sin, cos)


def build_shell_elements(
    points: np.ndarray,
    triangles: np.ndarray,
    youngs_modulus: float = 1e4,
    poisson_ratio: float = 0.3,
    thickness: float = 0.001,
    mass_density: float = 200.0,
    bending_stiffness: float = 10.0,
    num_vertices: int | None = None,
    vertex_offset: int = 0,
) -> ShellElements:
    """Precompute one shell's rest state (NeoHookeanShell.apply_to params).

    ``points`` are the shell's OWN rest positions (local, (Vl, 3));
    ``triangles`` index into them. ``vertex_offset`` / ``num_vertices``
    relocate the element ids and the mass vector into a larger vertex
    array (union models); defaults build local (standalone) elements.
    """
    P = np.asarray(points, np.float64)
    T = np.asarray(triangles, np.int64)
    V = num_vertices if num_vertices is not None else len(P)

    e1 = P[T[:, 1]] - P[T[:, 0]]
    e2 = P[T[:, 2]] - P[T[:, 0]]
    n = np.cross(e1, e2)
    area2 = np.linalg.norm(n, axis=-1)
    if (area2 < 1e-14).any():
        raise ValueError("degenerate rest triangle in shell mesh")
    t1 = e1 / np.linalg.norm(e1, axis=-1, keepdims=True)
    nn = n / area2[:, None]
    t2 = np.cross(nn, t1)
    # rest 2x2 material matrix D = [[e1.t1, e2.t1], [0, e2.t2]]
    D = np.zeros((len(T), 2, 2))
    D[:, 0, 0] = (e1 * t1).sum(-1)
    D[:, 0, 1] = (e2 * t1).sum(-1)
    D[:, 1, 1] = (e2 * t2).sum(-1)
    area = 0.5 * area2

    E, nu = float(youngs_modulus), float(poisson_ratio)
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu + 1e-9))

    # lumped vertex masses: density * thickness * area / 3 per corner
    masses = np.zeros(V)
    np.add.at(
        masses,
        T.reshape(-1) + vertex_offset,
        np.repeat(mass_density * thickness * area / 3.0, 3),
    )

    # bending hinges: interior edges with their opposite vertices
    edge_map: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for ti, tri in enumerate(T):
        for k in range(3):
            a, b = int(tri[k]), int(tri[(k + 1) % 3])
            o = int(tri[(k + 2) % 3])
            edge_map.setdefault((min(a, b), max(a, b)), []).append((ti, o))
    hinges = []
    for (a, b), occ in edge_map.items():
        if len(occ) == 2:
            hinges.append((a, b, occ[0][1], occ[1][1]))
    if hinges:
        H = np.asarray(hinges, np.int64)
        e_len = np.linalg.norm(P[H[:, 1]] - P[H[:, 0]], axis=-1)
        # h_bar = 1/3 of the summed opposite heights (Grinspun weight)
        a_sum = area[[edge_map[(int(h[0]), int(h[1]))][0][0] for h in H]] + area[
            [edge_map[(int(h[0]), int(h[1]))][1][0] for h in H]
        ]
        h_bar = (2.0 / 3.0) * a_sum / e_len
        # plate-bending modulus k_b = E_bend * t^3 / 12 per unit width,
        # times the discrete-shells hinge weight |e|/h_bar
        kb = bending_stiffness * thickness**3 / 12.0
        hinge_w = kb * e_len / np.maximum(h_bar, 1e-9)
        theta0 = _dihedral_np(P, H)
        H = H + vertex_offset
    else:
        H = np.zeros((0, 4), np.int64)
        hinge_w = np.zeros((0,))
        theta0 = np.zeros((0,))

    Tm = len(T)
    return ShellElements(
        tris=(T + vertex_offset).astype(np.int32),
        d_inv=np.linalg.inv(D).astype(np.float32),
        rest_area=area.astype(np.float32),
        mu=np.full(Tm, mu, np.float32),
        lam=np.full(Tm, lam, np.float32),
        thickness=np.full(Tm, thickness, np.float32),
        masses=masses.astype(np.float64),
        hinges=H.astype(np.int32),
        hinge_w=np.asarray(hinge_w, np.float32),
        theta0=np.asarray(theta0, np.float32),
    )


def merge_shell_elements(parts: list[ShellElements], num_vertices: int) -> ShellElements:
    """Concatenate already-offset element bundles over one vertex array."""
    masses = np.zeros(num_vertices)
    for p in parts:
        masses[: len(p.masses)] += p.masses
    return ShellElements(
        tris=np.concatenate([p.tris for p in parts]),
        d_inv=np.concatenate([p.d_inv for p in parts]),
        rest_area=np.concatenate([p.rest_area for p in parts]),
        mu=np.concatenate([p.mu for p in parts]),
        lam=np.concatenate([p.lam for p in parts]),
        thickness=np.concatenate([p.thickness for p in parts]),
        masses=masses,
        hinges=np.concatenate([p.hinges for p in parts]),
        hinge_w=np.concatenate([p.hinge_w for p in parts]),
        theta0=np.concatenate([p.theta0 for p in parts]),
    )


class ShellElementsJax:
    """Device-resident constants of a ShellElements bundle (jit-friendly)."""

    def __init__(self, e: ShellElements):
        self.tris = jnp.asarray(e.tris)
        self.d_inv = jnp.asarray(e.d_inv)
        self.rest_area = jnp.asarray(e.rest_area)
        self.mu = jnp.asarray(e.mu)
        self.lam = jnp.asarray(e.lam)
        self.thickness = jnp.asarray(e.thickness)
        self.hinges = jnp.asarray(e.hinges)
        self.hinge_w = jnp.asarray(e.hinge_w)
        self.theta0 = jnp.asarray(e.theta0)


def membrane_energy(x, e: ShellElementsJax):
    """CST 2D Neo-Hookean membrane over world positions x (V, 3)."""
    if e.tris.shape[0] == 0:
        return 0.0
    a = x[e.tris[:, 0]]
    f1 = x[e.tris[:, 1]] - a  # (T, 3)
    f2 = x[e.tris[:, 2]] - a
    Fw = jnp.stack([f1, f2], axis=-1)  # (T, 3, 2) world edges
    F = jnp.einsum("tik,tkj->tij", Fw, e.d_inv)  # (T, 3, 2)
    C = jnp.einsum("tki,tkj->tij", F, F)  # (T, 2, 2)
    I2 = C[:, 0, 0] + C[:, 1, 1]
    detC = jnp.maximum(C[:, 0, 0] * C[:, 1, 1] - C[:, 0, 1] * C[:, 1, 0], 1e-12)
    lnJ = 0.5 * jnp.log(detC)
    psi = 0.5 * e.mu * (I2 - 2.0) - e.mu * lnJ + 0.5 * e.lam * lnJ**2
    return jnp.sum(psi * e.rest_area * e.thickness)


def bending_energy(x, e: ShellElementsJax):
    """Discrete-shells hinge bending over world positions x (V, 3)."""
    if e.hinges.shape[0] == 0:
        return 0.0
    H = e.hinges
    x0, x1, x2, x3 = x[H[:, 0]], x[H[:, 1]], x[H[:, 2]], x[H[:, 3]]
    ed = x1 - x0
    n1 = jnp.cross(ed, x2 - x0)
    n2 = jnp.cross(x3 - x0, ed)
    n1n = jnp.sqrt((n1**2).sum(-1) + 1e-16)
    n2n = jnp.sqrt((n2**2).sum(-1) + 1e-16)
    en = jnp.sqrt((ed**2).sum(-1) + 1e-16)
    cos = (n1 * n2).sum(-1) / (n1n * n2n)
    sin = (jnp.cross(n1, n2) * ed).sum(-1) / (n1n * n2n * en)
    theta = jnp.arctan2(sin, cos)
    return jnp.sum(e.hinge_w * (theta - e.theta0) ** 2)
