#!/usr/bin/env python
"""Generate the on-disk demo scenes (OBJ + JSON) that the CLI/loader path
consumes — tpt's analogue of the reference's scenes/ assets."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpt.io.objwriter import write_obj  # noqa: E402
from tpt.scene import procedural  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def cornell():
    from tpt.scene.structs import MaterialType

    scene = procedural.cornell_box(
        resolution=(800, 800),
        sphere_materials=(MaterialType.SPECULAR_REFLECTION,
                          MaterialType.SPECULAR_REFRACTION))
    write_obj(os.path.join(HERE, "cornell_box.obj"), scene.mesh, scene.materials)
    doc = {
        "Camera": {
            "RES": [800, 800], "FOVY": 39.3, "ITERATIONS": 64, "DEPTH": 8,
            "FILE": "cornell",
            "EYE": [278.0, 273.0, -800.0],
            "LOOKAT": [278.0, 273.0, 0.0],
            "UP": [0.0, 1.0, 0.0],
        },
        "Objects": [
            {"TRANS": [0, 0, 0], "ROTAT": [0, 0, 0], "SCALE": [1, 1, 1],
             "FILE": "cornell_box.obj"},
        ],
    }
    with open(os.path.join(HERE, "cornell.json"), "w") as f:
        json.dump(doc, f, indent=2)
    print("wrote cornell.json + cornell_box.obj",
          scene.mesh.num_triangles, "tris")


def stress():
    scene = procedural.stress_interior(num_triangles=143_000,
                                       resolution=(1920, 1080))
    write_obj(os.path.join(HERE, "stress_interior.obj"), scene.mesh,
              scene.materials)
    cam = scene.camera
    doc = {
        "Camera": {
            "RES": [1920, 1080], "FOVY": 45.0, "ITERATIONS": 16, "DEPTH": 8,
            "FILE": "stress",
            "EYE": list(cam.position), "LOOKAT": list(cam.look_at),
            "UP": [0.0, 1.0, 0.0],
        },
        "Objects": [
            {"TRANS": [0, 0, 0], "ROTAT": [0, 0, 0], "SCALE": [1, 1, 1],
             "FILE": "stress_interior.obj"},
        ],
    }
    with open(os.path.join(HERE, "stress.json"), "w") as f:
        json.dump(doc, f, indent=2)
    print("wrote stress.json + stress_interior.obj",
          scene.mesh.num_triangles, "tris")


def _checker(size=256, tiles=8, c0=(0.82, 0.78, 0.72), c1=(0.28, 0.26, 0.30)):
    import numpy as np

    y, x = np.mgrid[0:size, 0:size]
    t = ((x * tiles // size) + (y * tiles // size)) % 2
    rng = np.random.default_rng(5)
    noise = rng.uniform(0.93, 1.0, (size, size, 1)).astype(np.float32)
    img = np.where(t[..., None] == 0, np.float32(c0), np.float32(c1)) * noise
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _bricks(size=256, rows=8, cols=4):
    import numpy as np

    y, x = np.mgrid[0:size, 0:size]
    ry = (y * rows) // size
    shift = (ry % 2) * (size // (2 * cols))
    bx = ((x + shift) * cols) // size
    mortar = (((y * rows) % size < size * 0.06)
              | (((x + shift) * cols) % size < size * 0.08))
    brick = np.float32([0.62, 0.28, 0.20]) * (
        0.85 + 0.15 * np.cos(bx * 2.1 + ry * 1.3))[..., None]
    img = np.where(mortar[..., None], np.float32([0.75, 0.73, 0.70]), brick)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _ripple_normal_map(size=256, freq=3.0, amp=0.08):
    """Tangent-space normal map from an analytic ripple height field."""
    import numpy as np

    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    import math as m

    h = amp * np.sin(2 * m.pi * freq * x) * np.sin(2 * m.pi * freq * y)
    dhdx = np.gradient(h, axis=1) * size
    dhdy = np.gradient(h, axis=0) * size
    n = np.stack([-dhdx, -dhdy, np.ones_like(h)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return ((n * 0.5 + 0.5) * 255).astype(np.uint8)


def _sun_sky_hdr(w=256, h=128, sun_dir=(0.35, 0.45, 0.55), sun_power=120.0):
    """Lat-long HDR: gradient sky + ground + a bright sun disc (gives the
    env alias sampler a concentrated peak worth importance-sampling)."""
    import math as m

    import numpy as np

    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    theta = (v + 0.5) / h * m.pi          # 0 = up
    phi = (u + 0.5) / w * 2 * m.pi
    d = np.stack([np.sin(theta) * np.cos(phi), np.cos(theta),
                  np.sin(theta) * np.sin(phi)], -1)
    sky_t = np.clip(d[..., 1], 0, 1) ** 0.6
    horizon = np.float32([0.85, 0.75, 0.62])
    zenith = np.float32([0.25, 0.45, 0.95])
    img = horizon * (1 - sky_t[..., None]) + zenith * sky_t[..., None]
    ground = np.float32([0.23, 0.20, 0.17])
    img = np.where(d[..., 1:2] < 0, ground * (1 + 0.4 * d[..., 1:2]), img)
    sd = np.float32(sun_dir)
    sd /= np.linalg.norm(sd)
    cosang = (d * sd).sum(-1)
    sun = np.clip((cosang - 0.9995) / 0.0005, 0, 1) ** 2
    img = img + sun[..., None] * np.float32([1.0, 0.93, 0.82]) * sun_power
    return img.astype(np.float32)


def hero():
    """The flagship composition scene: textured + normal-mapped floor,
    brick wall, metal/glass/mirror spheres, a mesh light AND an HDR sun
    environment — every feature subsystem in one render (the reference's
    bunny/Sponza hero shots: /root/reference/scenes/bunny_rendering.json)."""
    import numpy as np
    from PIL import Image

    from tpt.io.image import save_hdr
    from tpt.scene.host import HostMaterial
    from tpt.scene.mesh import merge_meshes
    from tpt.scene.structs import MaterialType

    # textures + HDR
    Image.fromarray(_checker()).save(os.path.join(HERE, "hero_checker.png"))
    Image.fromarray(_bricks()).save(os.path.join(HERE, "hero_bricks.png"))
    Image.fromarray(_ripple_normal_map()).save(
        os.path.join(HERE, "hero_normal.png"))
    # metallic-roughness: G = roughness scale, B = metallic scale
    mr = np.zeros((64, 64, 3), np.uint8)
    yy, xx = np.mgrid[0:64, 0:64]
    mr[..., 1] = 90 + 120 * ((xx // 16 + yy // 16) % 2)
    mr[..., 2] = 255
    Image.fromarray(mr).save(os.path.join(HERE, "hero_mr.png"))
    save_hdr(os.path.join(HERE, "hero_env.hdr"), _sun_sky_hdr())

    mats = [
        HostMaterial("floor", basecolor=(1, 1, 1), roughness=0.65,
                     mtype=MaterialType.MICROFACET_PBR),
        HostMaterial("wall", basecolor=(1, 1, 1), roughness=0.9,
                     mtype=MaterialType.MICROFACET_PBR),
        HostMaterial("metal", basecolor=(0.95, 0.93, 0.88), metallic=0.95,
                     roughness=0.35, mtype=MaterialType.MICROFACET_PBR),
        HostMaterial("glass", basecolor=(1, 1, 1), ior=1.5,
                     mtype=MaterialType.SPECULAR_REFRACTION),
        HostMaterial("mirror", basecolor=(0.97, 0.97, 0.99),
                     mtype=MaterialType.SPECULAR_REFLECTION),
        HostMaterial("lamp", basecolor=(1.0, 0.85, 0.6), emittance=14.0),
    ]
    mid = {m.name: i for i, m in enumerate(mats)}

    floor = procedural.make_quad((-7, 0, 7), (7, 0, 7), (7, 0, -7),
                                 (-7, 0, -7), mid["floor"])
    floor.uvs = floor.uvs * 4.0  # tile the checker/normal maps
    wall = procedural.make_quad((-7, 0, 7), (-7, 6, 7), (7, 6, 7),
                                (7, 0, 7), mid["wall"])
    wall.uvs = wall.uvs * np.float32([6.0, 2.5])
    metal = procedural.make_uv_sphere((-2.4, 1.3, 2.2), 1.3, mid["metal"])
    glass = procedural.make_uv_sphere((0.3, 1.1, -0.4), 1.1, mid["glass"])
    mirror = procedural.make_uv_sphere((2.8, 1.5, 2.8), 1.5, mid["mirror"])
    lamp = procedural.make_quad((-1.2, 5.2, 1.8), (-1.2, 5.2, 3.2),
                                (1.2, 5.2, 3.2), (1.2, 5.2, 1.8),
                                mid["lamp"])
    mesh = merge_meshes([floor, wall, metal, glass, mirror, lamp])

    obj_path = os.path.join(HERE, "hero_studio.obj")
    write_obj(obj_path, mesh, mats)

    # append texture map lines to the generated MTL
    mtl_path = os.path.join(HERE, "hero_studio.mtl")
    maps = {
        "floor": ["map_Kd hero_checker.png", "map_bump hero_normal.png"],
        "wall": ["map_Kd hero_bricks.png"],
        "metal": ["map_Pr hero_mr.png"],
    }
    out = []
    with open(mtl_path) as f:
        for line in f:
            out.append(line)
            key = line.split()
            if len(key) == 2 and key[0] == "newmtl" and key[1] in maps:
                out.extend(m + "\n" for m in maps.pop(key[1]))
    with open(mtl_path, "w") as f:
        f.writelines(out)

    doc = {
        "Camera": {
            "RES": [960, 540], "FOVY": 38.0, "ITERATIONS": 48, "DEPTH": 8,
            "FILE": "hero",
            "EYE": [0.0, 2.6, -9.5],
            "LOOKAT": [0.0, 1.6, 0.0],
            "UP": [0.0, 1.0, 0.0],
        },
        "Environment Texture": {"FILE": "hero_env.hdr"},
        "Objects": [
            {"TRANS": [0, 0, 0], "ROTAT": [0, 0, 0], "SCALE": [1, 1, 1],
             "FILE": "hero_studio.obj"},
        ],
    }
    with open(os.path.join(HERE, "hero.json"), "w") as f:
        json.dump(doc, f, indent=2)
    print("wrote hero.json + hero_studio.obj + textures + hero_env.hdr",
          mesh.num_triangles, "tris")


if __name__ == "__main__":
    cornell()
    hero()
    if "--stress" in sys.argv:
        stress()
