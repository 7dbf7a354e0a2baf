"""Phong shading + light-source models, branchless and batched for TPU.

TPU-native equivalent of `/root/reference/include/ceres_slam/lighting/`:
`phong.hpp` (shade/shade_diffuse/shade_specular with NaN/negative-dot
guards), `directional_light.hpp`, `point_light.hpp`, `material.hpp`
(Phong params row-vector ``[ambient, specular, exponent]``), `texture.hpp`
(scalar per-vertex diffuse albedo), `vertex3d.hpp`.

The reference's early-return branches (phong.hpp:59-104) become
``jnp.where`` masks. Every guarded quantity (division, pow) is made safe
*before* the select so that both gradients and values stay finite — on
XLA both sides of a `where` are always evaluated.

A "vertex" here is simply the tuple of arrays (position, normal, phong
params, texture); material sharing (dataset_problem_phong.cpp:266-278,
vertices with the same material id share one Material/Texture) is a
gather: ``phong_params[material_id[j]]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_normalize(v: jnp.ndarray, eps: float = 0.0):
    """Normalize along the last axis; returns (unit_v, norm_sq).

    Where ``|v|^2 <= eps`` the direction is returned as zeros (matching the
    reference's zero-contribution guard paths)."""
    norm_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = norm_sq > eps
    safe = jnp.where(ok, norm_sq, jnp.ones_like(norm_sq))
    unit = jnp.where(ok, v / jnp.sqrt(safe), jnp.zeros_like(v))
    return unit, norm_sq[..., 0]


def shade_diffuse(normal, light_dir, texture):
    """Diffuse component (phong.hpp:59-74): ``kd * max(0, l . n)`` with a
    zero fallback for non-finite light directions."""
    finite = jnp.all(jnp.isfinite(light_dir), axis=-1)
    ldn = jnp.sum(light_dir * normal, axis=-1)
    return jnp.where(finite & (ldn > 0.0), texture * ldn, 0.0)


def shade_specular(normal, light_dir, camera_dir, ks, exponent):
    """Specular component (phong.hpp:77-104): ``ks * max(0, r . c)^alpha``
    with mirror direction ``r = 2 (n.l) n - l``, guarding |r| == 0 and the
    pow(<0, non-integer) NaN case."""
    ndl = jnp.sum(normal * light_dir, axis=-1, keepdims=True)
    mirror = 2.0 * ndl * normal - light_dir
    mirror_unit, mirror_norm_sq = _safe_normalize(mirror)
    mdc = jnp.sum(mirror_unit * camera_dir, axis=-1)
    ok = (mirror_norm_sq > 0.0) & (mdc > 0.0)
    safe_mdc = jnp.where(ok, mdc, jnp.ones_like(mdc))
    return jnp.where(ok, ks * safe_mdc**exponent, 0.0)


def shade_specular_blinn(normal, light_dir, camera_dir, ks, exponent):
    """Blinn-Phong variant (phong.hpp:108-132; unused by the reference
    pipeline but part of its API surface)."""
    halfway = light_dir + camera_dir
    halfway_unit, halfway_norm_sq = _safe_normalize(halfway)
    hdn = jnp.sum(halfway_unit * normal, axis=-1)
    ok = (halfway_norm_sq > 0.0) & (hdn > 0.0)
    safe_hdn = jnp.where(ok, hdn, jnp.ones_like(hdn))
    return jnp.where(ok, ks * safe_hdn**exponent, 0.0)


def phong_shade(normal, light_dir, camera_dir, phong_params, texture, light_colour=1.0):
    """Full Phong shade (phong.hpp:25-51).

    ``phong_params[..., 3] = [ambient, specular, exponent]``
    (material.hpp:18-22). The ambient component is hard-disabled in the
    reference (phong.hpp:32-33) — reproduced here. Output clamped to
    [0, 1] (phong.hpp:136-139). All args broadcast over leading dims.
    """
    # dtype pinned: a bare jnp.zeros defaults to f64 under x64 and would
    # silently promote the whole shade chain (r4: the f64 intensity
    # residual leaked into every Phong gradient; the segment-sum assembly
    # masked it by scatter-downcasting, the slotted path exposed it)
    ambient = jnp.zeros(
        jnp.broadcast_shapes(normal.shape[:-1], texture.shape),
        dtype=normal.dtype)
    diffuse = shade_diffuse(normal, light_dir, texture)
    specular = shade_specular(
        normal, light_dir, camera_dir, phong_params[..., 1], phong_params[..., 2]
    )
    col = light_colour * (ambient + diffuse + specular)
    return jnp.clip(col, 0.0, 1.0)


def directional_light_shade(
    vertex_pos, normal, phong_params, texture, light_dir, camera_pos, light_colour=1.0
):
    """Shade under a directional light (directional_light.hpp:82-91):
    camera direction is normalize(camera_pos - vertex), light direction is
    the (unit) light direction itself."""
    camera_dir, _ = _safe_normalize(camera_pos - vertex_pos)
    unit_light, _ = _safe_normalize(light_dir)
    return phong_shade(normal, unit_light, camera_dir, phong_params, texture, light_colour)


def point_light_shade(
    vertex_pos, normal, phong_params, texture, light_pos, camera_pos, light_colour=1.0
):
    """Shade under a point light (point_light.hpp:76-90): light direction is
    normalize(light_pos - vertex)."""
    light_dir, _ = _safe_normalize(light_pos - vertex_pos)
    camera_dir, _ = _safe_normalize(camera_pos - vertex_pos)
    return phong_shade(normal, light_dir, camera_dir, phong_params, texture, light_colour)
