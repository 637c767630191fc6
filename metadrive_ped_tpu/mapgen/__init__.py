"""Host-side procedural map compiler.

The reference builds maps as Panda3D/Bullet object graphs at reset time
(metadrive/component/map/pg_map.py, block/base_block.py). Here map generation
stays on the host (numpy) — mirroring the reference's per-seed map cache
(metadrive/manager/pg_map_manager.py:52-66) — and each map is *compiled* into
a fixed-size `SceneSpec` array pack consumed by the jit'd TPU step.
"""
from metadrive_ped_tpu.mapgen.scene import compile_scene, build_scene_pack

__all__ = ["compile_scene", "build_scene_pack"]
