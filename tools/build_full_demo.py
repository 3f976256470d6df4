"""Build and cache the full demo detector (~10k PMTs, ~42M triangles).

Run once per machine; afterwards bench.py and chroma-sim pick the
geometry + BVH + MBVH up from the cache (~/.chroma_tpu by default).
"""
import logging
import time

logging.basicConfig(level=logging.INFO)


def main():
    from chroma_tpu import demo
    from chroma_tpu.cache import Cache
    from chroma_tpu.loader import create_geometry_from_obj

    t0 = time.time()
    geo = demo.detector()
    geo.flatten()
    print('flattened in %.0f s: %d PMTs, %d triangles'
          % (time.time() - t0, geo.num_channels(),
             len(geo.mesh.triangles)))

    Cache().save_geometry('demo_full', geo)

    t0 = time.time()
    geo = create_geometry_from_obj(geo)
    print('BVH built in %.0f s' % (time.time() - t0))

    t0 = time.time()
    import os
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    from chroma_tpu.ops.geometry_pack import pack_geometry
    geom = pack_geometry(geo)
    print('MBVH packed in %.0f s: %d rows'
          % (time.time() - t0, geom.mbvh_rows.shape[0]))


if __name__ == '__main__':
    main()
