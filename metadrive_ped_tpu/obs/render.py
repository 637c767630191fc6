"""Host-side rendering: env.render("topdown") / env.render("rgb_array").

Reference: metadrive/obs/top_down_renderer.py (interactive pygame BEV) and
BaseEnv.render. Here rendering is a pure function of the compiled scene
textures + current SimState: the top-down view composes the baked map layers
(native C++ rasterizer) with rotated-box stamps for every object, returning
an RGB uint8 array the user can display or encode to video. "rgb_array"
returns a frame from the TPU raycast camera (ops/camera.py).
"""
import numpy as np

from metadrive_ped_tpu.obs.top_down import BAKE_RES, bake_map_textures

# palette (top_down_obs_impl.py colors, approximately)
COLOR_BG = np.array([245, 245, 245], np.uint8)
COLOR_ROAD = np.array([128, 128, 128], np.uint8)
COLOR_LINE = np.array([255, 255, 255], np.uint8)
COLOR_EGO = np.array([30, 160, 60], np.uint8)
COLOR_NPC = np.array([40, 80, 220], np.uint8)
COLOR_OBJ = np.array([235, 160, 40], np.uint8)
COLOR_PED = np.array([220, 40, 60], np.uint8)


def _stamp_box(img, cx, cy, heading, length, width, color, ppm):
    """Fill a rotated rectangle into img (row 0 = +y top)."""
    H, W, _ = img.shape
    hl, hw = length * ppm / 2, width * ppm / 2
    r = int(np.ceil(np.hypot(hl, hw)))
    x0, x1 = int(cx - r), int(cx + r) + 1
    y0, y1 = int(cy - r), int(cy + r) + 1
    x0, y0 = max(x0, 0), max(y0, 0)
    x1, y1 = min(x1, W), min(y1, H)
    if x0 >= x1 or y0 >= y1:
        return
    ys, xs = np.mgrid[y0:y1, x0:x1]
    dx = xs - cx
    dy = cy - ys  # screen y grows downward
    ch, sh = np.cos(heading), np.sin(heading)
    u = dx * ch + dy * sh
    v = -dx * sh + dy * ch
    mask = (np.abs(u) <= hl) & (np.abs(v) <= hw)
    img[y0:y1, x0:x1][mask] = color


def render_topdown(env, env_index=0, size=512, window_m=100.0):
    """RGB top-down frame [size, size, 3] centered on the ego of one env."""
    if getattr(env, "_render_textures", None) is None:
        env._render_textures = bake_map_textures(env._pack, env.scene.num_scenarios)
    textures, origins = env._render_textures
    textures = np.asarray(textures)
    origins = np.asarray(origins)

    state = env._state
    sidx = int(np.asarray(state.sidx)[env_index])
    ego_pos = np.asarray(state.ego.pos)[env_index]
    origin = origins[sidx]

    # crop the static layers around the ego
    half_px = int(window_m / 2 / BAKE_RES)
    cx = int((ego_pos[0] - origin[0]) / BAKE_RES)
    cy = int((ego_pos[1] - origin[1]) / BAKE_RES)
    tex = textures[sidx]
    Ht, Wt = tex.shape[1], tex.shape[2]
    img_t = np.zeros((2 * half_px, 2 * half_px, 3), np.uint8)
    img_t[:] = COLOR_BG
    sy0, sy1 = max(cy - half_px, 0), min(cy + half_px, Ht)
    sx0, sx1 = max(cx - half_px, 0), min(cx + half_px, Wt)
    dy0 = sy0 - (cy - half_px)
    dx0 = sx0 - (cx - half_px)
    road = tex[0, sy0:sy1, sx0:sx1] > 0
    line = tex[1, sy0:sy1, sx0:sx1] > 0
    patch = img_t[dy0:dy0 + road.shape[0], dx0:dx0 + road.shape[1]]
    patch[road] = COLOR_ROAD
    patch[line] = COLOR_LINE
    # flip so +y (world) points up on screen
    img_t = img_t[::-1].copy()

    ppm = 1.0 / BAKE_RES

    def world_to_px(p):
        x = (p[0] - ego_pos[0]) * ppm + half_px
        y = half_px - (p[1] - ego_pos[1]) * ppm
        return x, y

    # dynamic objects of this env
    def stamp_all(pos, heading, length, width, active, color):
        pos = np.asarray(pos)
        heading = np.asarray(heading)
        length = np.asarray(length)
        width = np.asarray(width)
        active = np.asarray(active)
        for i in range(pos.shape[0]):
            if not active[i]:
                continue
            x, y = world_to_px(pos[i])
            _stamp_box(img_t, x, y, float(heading[i]), float(length[i]),
                       float(width[i]), color, ppm)

    npc = state.npc
    stamp_all(np.asarray(npc.pos)[env_index], np.asarray(npc.heading)[env_index],
              np.asarray(npc.params.length)[env_index], np.asarray(npc.params.width)[env_index],
              np.asarray(npc.active)[env_index], COLOR_NPC)
    pack = env._pack
    stamp_all(pack["obj_pos"][sidx], pack["obj_heading"][sidx], pack["obj_len"][sidx],
              pack["obj_wid"][sidx], pack["obj_valid"][sidx], COLOR_OBJ)
    from metadrive_ped_tpu.ops import participants
    import jax.numpy as jnp
    ped_pos, ped_heading = participants.ped_world_pose(env.scene, state.sidx, state.ped)
    stamp_all(np.asarray(ped_pos)[env_index], np.asarray(ped_heading)[env_index],
              pack["ped_len"][sidx], pack["ped_wid"][sidx],
              np.asarray(state.ped.active)[env_index], COLOR_PED)
    ex, ey = world_to_px(ego_pos)
    _stamp_box(img_t, ex, ey, float(np.asarray(state.ego.heading)[env_index]),
               float(np.asarray(state.ego.params.length)[env_index]),
               float(np.asarray(state.ego.params.width)[env_index]), COLOR_EGO, ppm)

    # nearest-neighbor upscale to the requested size
    if img_t.shape[0] != size:
        idx = (np.arange(size) * img_t.shape[0] / size).astype(int)
        img_t = img_t[idx][:, idx]
    return img_t


def render_rgb_array(env, env_index=0, width=256, height=144):
    """Camera RGB frame [height, width, 3] uint8 for one env."""
    import jax
    from metadrive_ped_tpu.ops import camera as cam_ops

    key = (width, height)
    if getattr(env, "_render_rgb_key", None) != key:
        def run(state):
            targets, kinds = env._lidar_targets(state)
            cam = env.config["camera"]
            out = cam_ops.render(
                env.scene, state.sidx, state.ego, targets, kinds,
                env.scene.obj_kind[state.sidx],
                width=width, height=height, fov_deg=cam["fov"],
                pitch_deg=cam["pitch"], cam_height=cam["height"],
                max_dist=cam["max_dist"],
            )
            return out["rgb"]
        env._render_rgb_jit = jax.jit(run)
        env._render_rgb_key = key
    frame = np.asarray(env._render_rgb_jit(env._state))[env_index]
    return (frame * 255).astype(np.uint8)


def render_dashboard(env, env_index=0, width=320, height=80):
    """Dashboard panel [height, width, 3] uint8 showing steering, throttle,
    brake, and speed bars (reference: component/sensors/dashboard.py — a
    GUI-only panel whose perceive() raises; here it renders to an array the
    user can blit next to env.render frames). MAX_SPEED=120 km/h matches the
    reference's gauge scale (dashboard.py:22)."""
    import numpy as np

    MAX_SPEED = 120.0
    state = env._state
    steering = float(np.asarray(state.ego.steering)[env_index])
    throttle = float(np.asarray(state.ego.throttle)[env_index])
    speed = float(np.asarray(state.ego.speed)[env_index]) * 3.6

    img = np.full((height, width, 3), 40, np.uint8)
    rows = [
        ("steering", (steering + 1) / 2, np.array([90, 170, 250], np.uint8)),
        ("throttle", max(throttle, 0.0), np.array([90, 220, 120], np.uint8)),
        ("brake", max(-throttle, 0.0), np.array([240, 90, 90], np.uint8)),
        ("speed", min(max(speed, 0.0) / MAX_SPEED, 1.0),
         np.array([250, 210, 90], np.uint8)),
    ]
    bar_h = height // len(rows)
    pad = max(bar_h // 4, 2)
    x0 = width // 8
    for i, (_, frac, color) in enumerate(rows):
        y0 = i * bar_h + pad
        y1 = (i + 1) * bar_h - pad
        img[y0:y1, x0:width - 4] = 70                      # track
        img[y0:y1, x0:x0 + int((width - 4 - x0) * frac)] = color
        # centre tick for the signed steering bar
        if i == 0:
            mid = x0 + (width - 4 - x0) // 2
            img[y0:y1, mid:mid + 2] = 255
    return img
