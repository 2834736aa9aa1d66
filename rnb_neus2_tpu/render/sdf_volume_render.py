"""Render paths for the inherited instant-ngp Sdf and Volume modes.

SDF mode (reference: src/testbed_sdf.cu):
- sphere tracing as a fixed-iteration fori_loop with alive masks
  (advance_pos_kernel_sdf, :150-222 — pos += predicted_distance·dir,
  converged when the step falls under maximum_distance; the octree
  skip / floor plane are the GUI's scene dressing, floor kept, octree
  skip subsumed by the aabb clip);
- soft shadow rays toward the sun with the Inigo Quilez min-visibility
  estimator (prepare_shadow_rays/write_shadow_ray_result, :234-297);
- Disney-BRDF-lite shading (evaluate_shading, :78-147, itself based on
  the public Disney BRDF notes) with the reference's default
  BRDFParams (include/…/sdf.h:61-71), sun/sky/checkerboard-floor
  palette of shade_kernel_sdf (:299-360) and its render modes
  (AO / Shade / Depth / Positions / Normals / Cost).

Volume mode (reference: src/testbed_volume.cu):
- ratio-tracking compositor (volume_render_kernel_step, :330-392):
  exponential free-flight steps with mean distance_scale/majorant,
  per-event alpha = min(density/majorant, 1)·T, front-to-back
  accumulation, terminated at opacity 0.99 or on leaving the AABB;
- procedural sun/sky envmap background (proc_envmap, :47-62).
  Our VolumeField fits density only (the train path's target), so
  events emit a constant albedo color — the reference's learned RGB
  emission needs its GT tracer's absorption colors, which exist only
  in its NanoVDB pipeline.

All tracers are vectorized over every pixel at once with fixed trip
counts — the TPU shape discipline — instead of the reference's
compaction queues.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Disney-BRDF-lite (testbed_sdf.cu:49-147)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BRDFParams:
    """include/neural-graphics-primitives/sdf.h:61-71 defaults."""

    metallic: float = 0.0
    subsurface: float = 0.0
    specular: float = 1.0
    roughness: float = 0.5
    sheen: float = 0.0
    clearcoat: float = 0.0
    clearcoat_gloss: float = 0.0
    basecolor: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    ambientcolor: Tuple[float, float, float] = (0.0, 0.0, 0.0)


def _mix(a, b, t):
    return a + (b - a) * t


def _schlick(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return (m * m) ** 2 * m


def _g1(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return jnp.where(a >= 1.0, 1.0 / math.pi,
                     (a2 - 1.0) / (math.pi * jnp.log(a2) * t))


def _g2(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return a2 / (math.pi * t * t)


def _smith_ggx(ndotv, alpha_g):
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / (ndotv + jnp.sqrt(a + b - a * b))


def evaluate_shading(base_color, ambient_color, light_color, brdf: BRDFParams,
                     L, V, N, metallic=None, specular=None, roughness=None):
    """jnp port of evaluate_shading (testbed_sdf.cu:78-147). base/ambient/
    light colors and L/V/N are (..., 3); scalar overrides support the
    floor material of shade_kernel_sdf."""
    ndotl = jnp.sum(N * L, axis=-1)
    metallic = jnp.broadcast_to(jnp.asarray(
        brdf.metallic if metallic is None else metallic, jnp.float32),
        ndotl.shape)
    specular = jnp.broadcast_to(jnp.asarray(
        brdf.specular if specular is None else specular, jnp.float32),
        ndotl.shape)
    roughness = jnp.broadcast_to(jnp.asarray(
        brdf.roughness if roughness is None else roughness, jnp.float32),
        ndotl.shape)
    ndotv = jnp.sum(N * V, axis=-1)
    H = L + V
    H = H / jnp.linalg.norm(H, axis=-1, keepdims=True)
    ndoth = jnp.sum(N * H, axis=-1)
    ldoth = jnp.sum(L * H, axis=-1)

    fl, fv = _schlick(ndotl), _schlick(ndotv)
    amb = ambient_color * _mix(0.2, fv, metallic)[..., None] * base_color

    luminance = jnp.sum(base_color * jnp.asarray([0.3, 0.6, 0.1]), axis=-1)
    ctint = base_color / (luminance[..., None] + 1e-5)
    cspec0 = _mix(jnp.ones_like(ctint) * (specular * 0.08)[..., None],
                  base_color, metallic[..., None])
    fd90 = 0.5 + 2.0 * ldoth * ldoth * roughness
    fd = _mix(1.0, fd90, fl) * _mix(1.0, fd90, fv)

    fss90 = ldoth * ldoth * roughness
    fss = _mix(1.0, fss90, fl) * _mix(1.0, fss90, fv)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(ndotl + ndotv, 1e-6) - 0.5) + 0.5)

    a = jnp.maximum(0.001, roughness * roughness)
    ds = _g2(ndoth, a)
    fh = _schlick(ldoth)
    fs = _mix(cspec0, jnp.ones_like(cspec0), fh[..., None])
    gs = _smith_ggx(ndotl, a) * _smith_ggx(ndotv, a)

    fsheen = fh[..., None] * brdf.sheen * jnp.ones_like(ctint)

    dr = _g1(ndoth, _mix(0.1, 0.001, brdf.clearcoat_gloss))
    fr = _mix(0.04, 1.0, fh)
    gr = _smith_ggx(ndotl, 0.25) * _smith_ggx(ndotv, 0.25)
    ccs = 0.25 * brdf.clearcoat * gr * fr * dr

    diffuse = (1.0 / math.pi) * _mix(fd, ss, brdf.subsurface)[..., None] \
        * base_color + fsheen
    out = (diffuse * (1.0 - metallic)[..., None]
           + (gs * ds)[..., None] * fs + ccs[..., None])
    lit = out * light_color * jnp.maximum(ndotl, 0.0)[..., None] + amb
    # the reference returns only the ambient term when the surface faces
    # away from light or camera
    facing = (ndotl >= 0.0) & (ndotv >= 0.0)
    return jnp.where(facing[..., None], lit, amb)


# ---------------------------------------------------------------------------
# cameras + sphere tracing
# ---------------------------------------------------------------------------

def orbit_camera(theta: float = 0.6, phi: float = 0.4, radius: float = 1.6,
                 center=(0.5, 0.5, 0.5)):
    """Simple look-at camera around the unit cube (the facade's default
    viewpoint; the reference's GUI camera serves this role)."""
    import numpy as np
    c = np.asarray(center, np.float32)
    eye = c + radius * np.asarray([
        math.cos(phi) * math.sin(theta),
        math.sin(phi),
        math.cos(phi) * math.cos(theta)], np.float32)
    fwd = c - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray([0.0, 1.0, 0.0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    rot = np.stack([right, down, fwd], axis=1)  # columns = x,y,z axes
    return jnp.asarray(rot), jnp.asarray(eye)


def camera_rays(rot, eye, W: int, H: int, fov_deg: float = 50.0):
    """Pixel-center rays; x right, y down, z forward (the dataset
    convention, geom/camera.py)."""
    focal = 0.5 * W / math.tan(0.5 * math.radians(fov_deg))
    u = (jnp.arange(W) + 0.5 - 0.5 * W) / focal
    v = (jnp.arange(H) + 0.5 - 0.5 * H) / focal
    uu, vv = jnp.meshgrid(u, v)                     # (H, W)
    d_cam = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1).reshape(-1, 3)
    d = d_cam @ rot.T
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(eye, d.shape)
    return o, d


def _aabb_enter(o, d, lo=0.0, hi=1.0):
    inv = 1.0 / d
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return jnp.maximum(tmin, 0.0), tmax


def sphere_trace(sdf_fn: Callable, o, d, n_steps: int = 80,
                 zero_offset: float = 0.0, distance_scale: float = 0.95,
                 maximum_distance: float = 5e-5,
                 track_visibility: bool = False,
                 shadow_sharpness: float = 2048.0):
    """advance_pos_kernel_sdf (testbed_sdf.cu:150-222) over all rays at
    once: each alive ray advances by the (scaled) predicted distance;
    convergence when the step drops below maximum_distance. Returns
    (positions, hit, n_steps_taken, min_visibility)."""
    t_enter, t_exit = _aabb_enter(o, d)
    pos0 = o + (t_enter + 1e-4)[:, None] * d
    inside = t_enter < t_exit
    state = (pos0, inside, jnp.zeros(o.shape[0], jnp.int32),
             jnp.ones(o.shape[0]),                    # min_visibility
             jnp.full(o.shape[0], 1e10),              # prev distance
             jnp.zeros(o.shape[0]))                   # total distance

    def body(_, st):
        pos, alive, steps, minvis, prev, total = st
        dist = (sdf_fn(pos) - zero_offset) * distance_scale
        newpos = pos + dist[:, None] * d
        if track_visibility:
            # iq soft shadows (advance_pos_kernel_sdf:199-208)
            y = dist * dist / (2.0 * prev)
            dd = jnp.sqrt(jnp.maximum(dist * dist - y * y, 0.0))
            vis = shadow_sharpness * dd / jnp.maximum(total - y, 1e-6)
            minvis = jnp.where(alive & (dist > 0), jnp.minimum(minvis, vis),
                               minvis)
            prev = jnp.where(alive, dist, prev)
            total = jnp.where(alive, total + dist, total)
        in_box = jnp.all((newpos >= 0.0) & (newpos <= 1.0), axis=-1)
        # stay_alive: step still larger than the convergence threshold
        converged = jnp.abs(dist) <= maximum_distance
        pos = jnp.where(alive[:, None], newpos, pos)
        steps = steps + alive.astype(jnp.int32)
        alive = alive & in_box & ~converged
        return pos, alive, steps, minvis, prev, total

    pos, alive, steps, minvis, _, _ = jax.lax.fori_loop(
        0, n_steps, body, state)
    in_box = jnp.all((pos >= 0.0) & (pos <= 1.0), axis=-1)
    hit = inside & in_box & ~alive
    # occluded shadow rays (still alive = reached something) → vis 0
    minvis = jnp.where(track_visibility & ~alive & in_box,
                       jnp.zeros_like(minvis), jnp.clip(minvis, 0.0, 1.0))
    return pos, hit, steps, minvis


SUN_COLOR = jnp.asarray([255.0, 225.0, 195.0]) / 255.0       # :341
SKY_COLOR = jnp.asarray([195.0, 215.0, 255.0]) / 255.0       # :342
DEFAULT_SUN_DIR = (1.0 / math.sqrt(3.0),) * 3                # testbed.h:543
DEFAULT_UP_DIR = (0.0, 1.0, 0.0)                             # testbed.h:542


def render_sdf(sdf_fn: Callable, W: int = 256, H: int = 256,
               mode: str = "shade", brdf: BRDFParams = BRDFParams(),
               rot=None, eye=None, fov_deg: float = 50.0,
               sun_dir=DEFAULT_SUN_DIR, up_dir=DEFAULT_UP_DIR,
               floor_y: float = -10.0, n_steps: int = 80,
               shadows: bool = True):
    """Full SDF render frame (render_sdf + shade_kernel_sdf). Returns
    (H, W, 4) float RGBA and (H, W) depth."""
    if rot is None or eye is None:
        rot, eye = orbit_camera()
    o, d = camera_rays(rot, eye, W, H, fov_deg)
    pos, hit, steps, _ = sphere_trace(sdf_fn, o, d, n_steps=n_steps)

    sun = jnp.asarray(sun_dir)
    sun = sun / jnp.linalg.norm(sun)
    up = jnp.asarray(up_dir)

    # normals via the field's analytic/autodiff gradient
    grad = jax.vmap(jax.grad(lambda p: jnp.sum(sdf_fn(p[None]))))(pos)
    normal = grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)

    floor = (pos[:, 1] < floor_y + 1e-3) & (d[:, 1] < 0.0)
    normal = jnp.where(floor[:, None], jnp.asarray([0.0, 1.0, 0.0]), normal)

    cam_fwd = rot[:, 2]
    depth = jnp.sum((pos - eye) * cam_fwd, axis=-1)

    if mode == "shade":
        if shadows:
            # shadow rays toward the sun (prepare_shadow_rays: offset the
            # origin out of the surface along the normal)
            so = pos + normal * 1e-3
            _, _, _, vis = sphere_trace(sdf_fn, so,
                                        jnp.broadcast_to(sun, so.shape),
                                        n_steps=n_steps,
                                        track_visibility=True)
        else:
            vis = jnp.ones(pos.shape[0])
        skyam = -jnp.sum(normal * up, axis=-1) * 0.5 + 0.5
        suncol = SUN_COLOR * 4.0 * vis[:, None]
        skycol = SKY_COLOR * 4.0 * skyam[:, None]
        base = jnp.asarray(brdf.basecolor) ** 2
        amb = jnp.asarray(brdf.ambientcolor) * skycol
        check_size = 8.0
        check = ((jnp.floor(check_size * pos[:, 0]).astype(jnp.int32)
                  ^ jnp.floor(check_size * pos[:, 2]).astype(jnp.int32))
                 & 1).astype(jnp.float32) * 0.6 + 0.2
        floorcol = jnp.stack([check ** 3, check ** 2, check], axis=-1)
        color = evaluate_shading(
            jnp.where(floor[:, None], floorcol, base), amb, suncol, brdf,
            jnp.broadcast_to(sun, pos.shape),
            -d, normal,
            metallic=jnp.where(floor, 0.0, brdf.metallic),
            specular=jnp.where(floor, 1.0, brdf.specular),
            roughness=jnp.where(floor, 0.5, brdf.roughness))
    elif mode == "ao":
        color = jnp.broadcast_to((0.92 ** steps)[:, None], pos.shape)
    elif mode == "depth":
        color = jnp.broadcast_to(depth[:, None], pos.shape)
    elif mode == "positions":
        color = (pos - 0.5) / 2.0 + 0.5
    elif mode == "normals":
        color = 0.5 * normal + 0.5
    elif mode == "cost":
        color = jnp.broadcast_to((steps / 30.0)[:, None], pos.shape)
    else:
        raise ValueError(f"unknown SDF render mode {mode!r}")

    rgba = jnp.concatenate(
        [jnp.where(hit[:, None], color, 0.0),
         hit[:, None].astype(jnp.float32)], axis=-1)
    return rgba.reshape(H, W, 4), jnp.where(hit, depth, 0.0).reshape(H, W)


# ---------------------------------------------------------------------------
# volume rendering (testbed_volume.cu)
# ---------------------------------------------------------------------------

def proc_envmap(d, up, sun, skycol):
    """Procedural sun/sky background (testbed_volume.cu:47-62)."""
    skyam = jnp.sum(d * up, axis=-1) * 0.5 + 0.5
    sunam = jnp.maximum(0.0, jnp.sum(d * sun, axis=-1)) ** 64
    rgb = skycol * skyam[:, None] \
        + jnp.asarray([255.0, 215.0, 195.0]) / 255.0 * (20.0 * sunam[:, None])
    return rgb


def render_volume(density_fn: Callable, W: int = 256, H: int = 256,
                  rot=None, eye=None, fov_deg: float = 50.0,
                  key=None, global_majorant: float = 1.0,
                  distance_scale: float = 1.0,
                  albedo: float = 0.95,
                  sky_col=(0.05, 0.25, 0.5),
                  sun_dir=DEFAULT_SUN_DIR, up_dir=DEFAULT_UP_DIR,
                  max_events: int = 128):
    """Ratio-tracking compositor (volume_render_kernel_step,
    testbed_volume.cu:330-392): exponential free-flight steps with mean
    distance_scale/majorant; per-event alpha = min(density/majorant,1)·T;
    finish at opacity 0.99 or on exiting the AABB; remaining transmittance
    takes the procedural envmap. Events emit constant-albedo grey (our
    VolumeField is density-only — module docstring)."""
    if rot is None or eye is None:
        rot, eye = orbit_camera()
    if key is None:
        key = jax.random.PRNGKey(0)
    o, d = camera_rays(rot, eye, W, H, fov_deg)
    n = o.shape[0]
    t_enter, t_exit = _aabb_enter(o, d)
    inside = t_enter < t_exit
    pos = o + (t_enter + 1e-5)[:, None] * d
    scale = distance_scale / global_majorant

    sun = jnp.asarray(sun_dir)
    sun = sun / jnp.linalg.norm(sun)
    up = jnp.asarray(up_dir)
    sky = jnp.asarray(sky_col)

    def body(i, st):
        pos, rgb, opa, alive, key = st
        key, k = jax.random.split(key)
        # free-flight step (walk_to_next_event without the bitgrid skip)
        u = jax.random.uniform(k, (n,), minval=1e-7, maxval=1.0)
        step = -jnp.log(u) * scale
        newpos = pos + step[:, None] * d
        in_box = jnp.all((newpos >= 0.0) & (newpos <= 1.0), axis=-1)
        dens = density_fn(newpos)
        ext = jnp.minimum(dens / global_majorant, 1.0)
        T = 1.0 - opa
        alpha = jnp.where(alive & in_box, ext * T, 0.0)
        rgb = rgb + albedo * alpha[:, None]
        opa = opa + alpha
        alive = alive & in_box & (opa <= 0.99)
        pos = jnp.where(alive[:, None], newpos, pos)
        return pos, rgb, opa, alive, key

    rgb0 = jnp.zeros((n, 3))
    st = (pos, rgb0, jnp.zeros(n), inside, key)
    _, rgb, opa, _, _ = jax.lax.fori_loop(0, max_events, body, st)
    env = proc_envmap(d, up, sun, sky)
    rgb = rgb + (1.0 - opa)[:, None] * env
    rgba = jnp.concatenate([rgb, jnp.ones((n, 1))], axis=-1)
    return rgba.reshape(H, W, 4)
