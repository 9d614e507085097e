"""North-star showcase renders: 1920x1080, 256 spp, 10 bounces, all three
shipped scenes on the production dense megakernel (VERDICT round-4 item 3;
the contract config SURVEY.md section 6 derives from io/params.h:204-222).

Renders in 135-row chunks (the bench chunking), times the steady-state
full frame best-of-3 AFTER compile, saves PNGs to assets/, prints one
RESULT line per scene. Run under the axon env in the background.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.scenes import SCENE_NAMES, build_scene, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas
from spectral_tpu.render.wavefront import xyz_to_image
from spectral_tpu.io.image import save_image

W, H, SPP, BL = 1920, 1080, 256, 10
CHUNK = 135

only = os.environ.get("SCENE", "")
for sid in ([int(only)] if only else [0, 1, 2]):
    name = SCENE_NAMES[sid]
    scene = build_scene(sid)
    cam = scene_camera(sid, W, H)

    def frame(seed_base):
        outs = []
        for i, y0 in enumerate(range(0, H, CHUNK)):
            outs.append(
                render_chunk_pallas(
                    scene, cam, seed_base + i * 1000003,
                    0, y0, W, CHUNK, SPP, BL,
                )
            )
        return outs

    t0 = time.time()
    outs = frame(1984)
    jax.block_until_ready(outs)
    print(f"{name}: compile+first frame {time.time()-t0:.1f}s", flush=True)
    img = np.asarray(
        xyz_to_image(jnp.concatenate([jnp.asarray(o) for o in outs], axis=0), SPP)
    )
    path = f"/root/repo/assets/{name.lower()}_1080p_256spp_megakernel.png"
    save_image(img, path)
    print(f"{name}: saved {path} (mean {img.mean():.2f})", flush=True)

    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(frame(7000 + rep))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"{name} rep {rep}: {dt:.2f} s", flush=True)
    rate = W * H * SPP * BL / best / 1e6
    print(
        f"RESULT showcase {name} 1920x1080 256spp bl{BL}: "
        f"{rate:.1f} Mray-steps/s ({best:.2f} s/frame)",
        flush=True,
    )
