"""Phong-illumination bundle adjustment: joint geometry + lighting.

TPU-native counterpart of the reference's `dataset_ba_phong` problem
construction (tests/dataset_ba_phong.cpp:26-255): stereo reprojection +
intensity + normal factors over poses, vertex positions, vertex normals,
shared per-material Phong parameters/textures, and one light source
(point position or unit direction). Reproduces:

- material/texture sharing via gather by material id
  (dataset_problem_phong.cpp:266-278 -> `phong[material_idx]`),
- unit-sphere constraints on normals and light direction
  (UnitVectorPerturbation, tests/dataset_ba_phong.cpp:183-204) via the
  tangent-plane projector chained into the Jacobians + the unit-vector
  retraction,
- box bounds on Phong params ([0,1]^2 x [1,inf)) and texture ([0,1])
  (tests/dataset_ba_phong.cpp:118-181) via projection after retraction,
- the optional 3-stage schedule (geometry -> lighting-only -> joint,
  :93-252) via static freeze flags.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ceres_slam_tpu.models.stereo_camera import StereoCamera
from ceres_slam_tpu.ops import factors, lie
from ceres_slam_tpu.solver import lm
from ceres_slam_tpu.solver.dense import _accumulate


class PhongObs(NamedTuple):
    """One batch of per-observation data (CSV rows [t,j,m,u,v,d,I,nx,ny,nz],
    dataset_problem_phong.cpp:102-117)."""

    uvd: jnp.ndarray  # [N, 3]
    int_obs: jnp.ndarray  # [N]
    normal_obs: jnp.ndarray  # [N, 3] observed normals, camera frame
    pose_idx: jnp.ndarray  # [N] int32
    vertex_idx: jnp.ndarray  # [N] int32
    material_idx: jnp.ndarray  # [N] int32
    valid: jnp.ndarray  # [N] bool


class PhongBAProblem(NamedTuple):
    camera: StereoCamera
    obs: PhongObs
    stereo_stiffness: jnp.ndarray  # [3, 3] shared (stereo_obs_var diagonal)
    normal_stiffness: jnp.ndarray  # [3, 3] shared
    int_stiffness: jnp.ndarray  # [] scalar 1/sqrt(int_var)
    fixed_pose_mask: jnp.ndarray  # [K] bool
    vertex_valid: jnp.ndarray  # [J] bool


class PhongState(NamedTuple):
    poses: jnp.ndarray  # [K, 12]
    points: jnp.ndarray  # [J, 3] vertex positions (global)
    normals: jnp.ndarray  # [J, 3] vertex normals (global, unit)
    phong: jnp.ndarray  # [M, 3] [ambient, specular, exponent] per material
    textures: jnp.ndarray  # [M] per-material diffuse albedo
    light: jnp.ndarray  # [3] light position (point) or direction (directional)


def _offsets(state: PhongState):
    K = state.poses.shape[0]
    J = state.points.shape[0]
    M = state.phong.shape[0]
    off_pt = 6 * K
    off_n = off_pt + 3 * J
    off_ph = off_n + 3 * J
    off_tex = off_ph + 3 * M
    off_light = off_tex + M
    return off_pt, off_n, off_ph, off_tex, off_light, off_light + 3


def _gathered_terms(problem: PhongBAProblem, state: PhongState, directional: bool):
    o = problem.obs
    T = state.poses[o.pose_idx]
    pts = state.points[o.vertex_idx]
    nrm = state.normals[o.vertex_idx]
    ph = state.phong[o.material_idx]
    tex = state.textures[o.material_idx]
    N = o.uvd.shape[0]
    dtype = state.poses.dtype

    r_st, Jp_st, Jpt_st = factors.stereo_reprojection(
        problem.camera, T, pts, o.uvd, jnp.broadcast_to(problem.stereo_stiffness, (N, 3, 3))
    )
    r_n, Jp_n, Jn_n = factors.normal_obs(
        T, nrm, o.normal_obs, jnp.broadcast_to(problem.normal_stiffness, (N, 3, 3))
    )
    intensity = (
        factors.intensity_directional_light
        if directional
        else factors.intensity_point_light
    )
    r_i, Jp_i, Jpt_i, Jn_i, Jph_i, Jtex_i, Jl_i = intensity(
        T, pts, nrm, ph, tex, state.light, o.int_obs,
        jnp.broadcast_to(problem.int_stiffness, (N,)).astype(dtype),
    )

    # Chain the unit-vector tangent projectors (the reference's
    # UnitVectorPerturbation parameterization Jacobian).
    P_n = factors.unit_vector_tangent_projector(nrm)
    Jn_n = Jn_n @ P_n
    Jn_i = jnp.einsum("ni,nij->nj", Jn_i, P_n)
    if directional:
        P_l = factors.unit_vector_tangent_projector(state.light)
        Jl_i = Jl_i @ P_l

    valid = (o.valid & problem.vertex_valid[o.vertex_idx]).astype(dtype)
    return (
        (r_st, Jp_st, Jpt_st),
        (r_n, Jp_n, Jn_n),
        (r_i, Jp_i, Jpt_i, Jn_i, Jph_i, Jtex_i, Jl_i),
        valid,
    )


def phong_cost(
    problem: PhongBAProblem, state: PhongState, use_light: bool, directional: bool
) -> jnp.ndarray:
    st, nr, it, valid = _gathered_terms(problem, state, directional)
    c = jnp.sum(jnp.sum(st[0] ** 2, axis=-1) * valid)
    if use_light:
        c = c + jnp.sum(jnp.sum(nr[0] ** 2, axis=-1) * valid)
        c = c + jnp.sum(it[0] ** 2 * valid)
    return 0.5 * c


def phong_normal_equations(
    problem: PhongBAProblem,
    state: PhongState,
    use_light: bool,
    directional: bool,
    freeze_geometry: bool,
):
    o = problem.obs
    off_pt, off_n, off_ph, off_tex, off_light, D = _offsets(state)
    dtype = state.poses.dtype
    H = jnp.zeros((D, D), dtype)
    g = jnp.zeros((D,), dtype)

    (st, nr, it, valid) = _gathered_terms(problem, state, directional)

    r_st, Jp_st, Jpt_st = st
    H, g = _accumulate(
        H, g, r_st,
        [(6 * o.pose_idx, Jp_st), (off_pt + 3 * o.vertex_idx, Jpt_st)],
        weight=valid,
    )

    if use_light:
        r_n, Jp_n, Jn_n = nr
        H, g = _accumulate(
            H, g, r_n,
            [(6 * o.pose_idx, Jp_n), (off_n + 3 * o.vertex_idx, Jn_n)],
            weight=valid,
        )
        r_i, Jp_i, Jpt_i, Jn_i, Jph_i, Jtex_i, Jl_i = it
        N = r_i.shape[0]
        zeros_off = jnp.zeros(N, jnp.int32)
        H, g = _accumulate(
            H, g, r_i[:, None],
            [
                (6 * o.pose_idx, Jp_i[:, None, :]),
                (off_pt + 3 * o.vertex_idx, Jpt_i[:, None, :]),
                (off_n + 3 * o.vertex_idx, Jn_i[:, None, :]),
                (off_ph + 3 * o.material_idx, Jph_i[:, None, :]),
                (off_tex + o.material_idx, Jtex_i[:, None, None]),
                (off_light + zeros_off, Jl_i[:, None, :]),
            ],
            weight=valid,
        )

    H, g = _apply_mask(problem, state, H, g, use_light, freeze_geometry)
    return H, g


def _free_vector(problem, state, use_light: bool, freeze_geometry: bool):
    K = state.poses.shape[0]
    J = state.points.shape[0]
    M = state.phong.shape[0]
    geom = not freeze_geometry
    free_pose = (~problem.fixed_pose_mask) & geom
    free_pt = problem.vertex_valid & geom
    light_on = bool(use_light)
    free_n = problem.vertex_valid & light_on
    parts = [
        jnp.repeat(free_pose, 6),
        jnp.repeat(free_pt, 3),
        jnp.repeat(free_n, 3),
        jnp.full(3 * M, light_on),
        jnp.full(M, light_on),
        jnp.full(3, light_on),
    ]
    return jnp.concatenate(parts)


def _apply_mask(problem, state, H, g, use_light, freeze_geometry):
    free = _free_vector(problem, state, use_light, freeze_geometry).astype(H.dtype)
    H = H * free[:, None] * free[None, :]
    g = g * free
    diag = jnp.diagonal(H)
    H = H + jnp.diag(jnp.where(diag == 0.0, 1.0, 0.0))
    return H, g


def phong_retract(
    problem: PhongBAProblem,
    state: PhongState,
    dx: jnp.ndarray,
    use_light: bool,
    directional: bool,
    freeze_geometry: bool,
) -> PhongState:
    K = state.poses.shape[0]
    J = state.points.shape[0]
    M = state.phong.shape[0]
    off_pt, off_n, off_ph, off_tex, off_light, D = _offsets(state)
    dx = dx * _free_vector(problem, state, use_light, freeze_geometry).astype(dx.dtype)

    d_pose = dx[:off_pt].reshape(K, 6)
    d_pt = dx[off_pt:off_n].reshape(J, 3)
    d_n = dx[off_n:off_ph].reshape(J, 3)
    d_ph = dx[off_ph:off_tex].reshape(M, 3)
    d_tex = dx[off_tex:off_light]
    d_l = dx[off_light:]

    poses = lie.se3_retract(state.poses, d_pose)
    points = state.points + d_pt
    normals = lie.unit_vector_retract(state.normals, d_n)
    # Box bounds via projection after the step (tests/dataset_ba_phong.cpp:142-181)
    phong = state.phong + d_ph
    phong = jnp.stack(
        [
            jnp.clip(phong[:, 0], 0.0, 1.0),
            jnp.clip(phong[:, 1], 0.0, 1.0),
            jnp.maximum(phong[:, 2], 1.0),
        ],
        axis=-1,
    )
    textures = jnp.clip(state.textures + d_tex, 0.0, 1.0)
    if directional:
        light = lie.unit_vector_retract(state.light, d_l)
    else:
        light = state.light + d_l
    return PhongState(poses, points, normals, phong, textures, light)


@partial(
    jax.jit,
    static_argnames=("config", "use_light", "directional", "freeze_geometry",
                     "linear_solver"),
)
def solve_phong_ba(
    problem: PhongBAProblem,
    state0: PhongState,
    config: lm.SolveConfig = lm.SolveConfig(),
    use_light: bool = True,
    directional: bool = False,
    freeze_geometry: bool = False,
    linear_solver: str = "dense",
    layout=None,
):
    """One LM solve of the Phong BA problem at the given stage flags.

    ``linear_solver``: 'dense' (full [D, D] Cholesky — fine at window
    scale) or 'schur' (vertex-block elimination, `solver/phong_schur.py`
    — the SPARSE_NORMAL_CHOLESKY role for full-batch problems,
    dataset_ba_phong.cpp:87; pass ``layout`` from
    `phong_schur.build_phong_layout` for the scatter-free assembly)."""
    cost_fn = lambda s: phong_cost(problem, s, use_light, directional)
    if linear_solver == "schur":
        from ceres_slam_tpu.solver import phong_schur

        step = phong_schur.phong_schur_step(
            problem, use_light, directional, freeze_geometry, layout=layout
        )
    else:
        normal_eq = lambda s: phong_normal_equations(
            problem, s, use_light, directional, freeze_geometry
        )
        step = lm.dense_cholesky_step(normal_eq)
    retract = lambda s, dx: phong_retract(
        problem, s, dx, use_light, directional, freeze_geometry
    )
    return lm.lm_solve(state0, config, cost_fn, step, retract)


def auto_linear_solver(state: PhongState) -> str:
    """Size-based solver selection: the dense [D, D] factorization wins at
    window scale; past ~1k dof the vertex-Schur reduction (whose big cost
    scales with D_r = 6K + 4M + 3, not D) takes over."""
    K = state.poses.shape[0]
    J = state.points.shape[0]
    M = state.phong.shape[0]
    D = 6 * K + 6 * J + 4 * M + 3
    return "schur" if D > 1024 else "dense"


def solve_phong_staged(
    problem: PhongBAProblem,
    state: PhongState,
    config: lm.SolveConfig = lm.SolveConfig(),
    use_light: bool = True,
    directional: bool = False,
    multistage: bool = False,
    linear_solver: str = "auto",
):
    """The reference's solve schedule (tests/dataset_ba_phong.cpp:93-252):
    optional stage 1 (geometry only) and stage 2 (lighting only, geometry
    frozen), then the joint solve."""
    if linear_solver == "auto":
        linear_solver = auto_linear_solver(state)
    layout = None
    if linear_solver == "schur":
        from ceres_slam_tpu.solver import phong_schur

        layout = phong_schur.build_phong_layout(
            problem, state.points.shape[0])
    summaries = []
    if multistage:
        state, s1 = solve_phong_ba(
            problem, state, config, use_light=False, directional=directional,
            linear_solver=linear_solver, layout=layout,
        )
        summaries.append(s1)
        if use_light:
            state, s2 = solve_phong_ba(
                problem, state, config,
                use_light=True, directional=directional, freeze_geometry=True,
                linear_solver=linear_solver, layout=layout,
            )
            summaries.append(s2)
    state, s3 = solve_phong_ba(
        problem, state, config, use_light=use_light, directional=directional,
        linear_solver=linear_solver, layout=layout,
    )
    summaries.append(s3)
    return state, summaries
