"""Branch-free ray/triangle and ray/AABB intersection primitives.

Vectorized re-engineering of the reference device functions
(reference: chroma/cuda/intersect.h): Moller-Trumbore with the same
epsilon conventions, and the slab method on precomputed inverse
directions.  All functions broadcast over leading batch axes; hits are
boolean masks instead of early returns.
"""
import jax.numpy as jnp

EPSILON = 1e-6
FLT_EPSILON = 1.1920929e-07


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a):
    return a / norm(a)[..., None]


def intersect_triangle(origin, direction, v0, v1, v2):
    """(hit, distance): Moller-Trumbore ray/triangle test.

    ``direction`` must be normalized.  Epsilon padding matches the
    reference (reference: chroma/cuda/intersect.h:25): barycentrics may
    stray EPSILON outside [0,1]; hits require t > EPSILON.
    """
    edge1 = v1 - v0
    edge2 = v2 - v0
    h = cross(direction, edge2)
    a = dot(edge1, h)
    not_parallel = jnp.abs(a) > FLT_EPSILON
    f = 1.0 / jnp.where(not_parallel, a, 1.0)
    s = origin - v0
    u = f * dot(s, h)
    q = cross(s, edge1)
    v = f * dot(direction, q)
    t = f * dot(edge2, q)
    hit = (not_parallel
           & (u >= -EPSILON) & (u <= 1.0 + EPSILON)
           & (v >= -EPSILON) & (u + v <= 1.0 + EPSILON)
           & (t > EPSILON))
    return hit, t


def intersect_box(neg_origin_inv_dir, inv_dir, lower, upper):
    """(hit, distance_to_box): slab-method ray/AABB test on
    precomputed 1/dir and -origin/dir (reference:
    chroma/cuda/intersect.h:106).  Axes with infinite inv_dir (ray
    parallel to slab) are skipped, matching the reference's isfinite
    guard."""
    finite = jnp.isfinite(inv_dir)
    t0 = lower * inv_dir + neg_origin_inv_dir
    t1 = upper * inv_dir + neg_origin_inv_dir
    tsmall = jnp.where(finite, jnp.minimum(t0, t1), -jnp.inf)
    tbig = jnp.where(finite, jnp.maximum(t0, t1), jnp.inf)
    tmin = jnp.maximum(jnp.max(tsmall, axis=-1), 0.0)
    tmax = jnp.min(tbig, axis=-1)
    return tmin <= tmax, tmin
