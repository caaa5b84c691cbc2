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


if __name__ == "__main__":
    cornell()
    if "--stress" in sys.argv:
        stress()
