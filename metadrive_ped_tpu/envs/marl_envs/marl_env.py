"""Multi-agent envs (vectorized, TPU-native).

Reference: metadrive/envs/marl_envs/multi_agent_metadrive.py:12-150 plus the
SpawnManager slot machinery (manager/spawn_manager.py:20-250). Agents live on
a second batch axis folded into rows: internal state is [E*A, ...] with the
A rows of one env sharing a scenario; agent interactions (mutual lidar +
collisions) reshape to [E, A].

Covered semantics:
- spawn slots tiled over spawn_roads at 8 m intervals, distinct random slot
  per agent per episode (spawn_manager.py:72-105 reset)
- delay_done corpses: done agents freeze in place for delay_done steps and
  keep blocking traffic (multi_agent_metadrive.py delay_done=25)
- respawn: after the corpse delay, agents re-enter at a random free slot
  while the episode horizon is not exhausted (allow_respawn)
- an env auto-resets only when ALL its agents are simultaneously finished
  ("__all__" aggregation, multi_agent_metadrive.py:130-150)

- respawn slot occupancy uses the reference's box sweep: an 8 x 3 m region
  at the spawn point must be free of every agent body
  (rect_region_detection, spawn_manager.py:27-29, 163)
- same-step respawns claim slots sequentially (a lax.scan over the agent
  axis), so two agents can never share a slot (spawn_places_used,
  spawn_manager.py:160-166)
- background IDM traffic: NPC state is canonical per ENV (agent-0 row) and
  stepped once against ALL agent bodies, then broadcast back to rows
"""
import jax
import jax.numpy as jnp
import numpy as np

from metadrive_ped_tpu.envs.metadrive_env import MetaDriveEnv

# RESPAWN_REGION box (spawn_manager.py:27-29)
RESPAWN_REGION_LONGITUDE = 8.0
RESPAWN_REGION_LATERAL = 3.0


class MultiAgentMetaDrive(MetaDriveEnv):
    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(
            dict(
                num_agents=15,
                delay_done=25,
                allow_respawn=True,
                crash_done=True,
                out_of_road_done=True,
                spawn_roads=[(">>", ">>>")],
                horizon=1000,
                truncate_as_terminate=True,
                # MARL reward scheme (multi_agent_metadrive.py:49-56)
                out_of_road_penalty=10.0,
                crash_vehicle_penalty=10.0,
                crash_object_penalty=10.0,
                out_of_road_cost=0.0,
                traffic_density=0.0,
                vehicle_config=dict(lidar=dict(num_lasers=72, distance=40.0)),
                # reference MARL scene configs carry top-down camera poses
                # (marl_inout_roundabout.py:20-22 et al.) — accepted and
                # ignored: there is no realtime top-down camera to aim
                top_down_camera_initial_x=0,
                top_down_camera_initial_y=0,
                top_down_camera_initial_z=120,
            ),
            allow_add_new_key=True,
        )
        return config

    def __init__(self, config=None):
        cfg_in = dict(config or {})
        super().__init__(cfg_in)
        self.agents_per_env = self.config["num_agents"]
        self.num_marl_envs = self.config["num_envs"]
        # internal row count: every agent is a row
        self.num_envs = self.num_marl_envs * self.agents_per_env

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)

    # scene compile must see the spawn roads
    def _scene_config(self):
        return dict(spawn_roads=[tuple(r) for r in self.config["spawn_roads"]])

    # ---- row plumbing -----------------------------------------------------
    def _rows_to_EA(self, x):
        return x.reshape((self.num_marl_envs, self.agents_per_env) + x.shape[1:])

    def _reset_impl(self, rng):
        E, A = self.num_marl_envs, self.agents_per_env
        rows = E * A
        keys = jax.random.split(rng, rows + 2)
        env_rng = keys[2:]
        sidx_env = jax.random.randint(keys[0], (E,), 0, self.scene.num_scenarios)
        sidx = jnp.repeat(sidx_env, A)
        slot = self._assign_slots(keys[1], sidx_env)  # [E,A]
        state = self._spawn(env_rng, sidx, slot.reshape(rows))
        obs = self._observe(state, self.scene.slot_long[sidx, state.ego.slot],
                            jnp.zeros(rows))
        self._last_obs = obs
        info = dict(env_seed=self._seed_of(sidx))
        return state, obs, info

    def _assign_slots(self, key, sidx_env):
        """Distinct random valid slots per agent within each env
        (spawn_manager.py:72-90: np_random.choice without replacement)."""
        E, A = self.num_marl_envs, self.agents_per_env
        SLOT = self.scene.slot_valid.shape[1]
        noise = jax.random.uniform(key, (E, SLOT))
        score = jnp.where(self.scene.slot_valid[sidx_env], noise, -1.0)
        order = jnp.argsort(-score, axis=1)  # valid slots first, random order
        return order[:, :A]

    # ---- hooks into the base step ----------------------------------------
    def _step_traffic(self, state, npc, ego, dt, rep, light_block):
        """Background IDM traffic in MARL: the NPC state is canonical per
        ENV (all A rows of one env carry identical copies). Step the
        canonical copy ONCE against every agent body, then broadcast back.
        The reference simply has one traffic manager per env."""
        if self.scene.npc_lane.shape[1] == 0 or self.config["traffic_density"] == 0.0:
            return npc
        from metadrive_ped_tpu.ops import idm as idm_ops
        E, A = self.num_marl_envs, self.agents_per_env
        take0 = lambda x: self._rows_to_EA(x)[:, 0]
        npc_env = jax.tree_util.tree_map(take0, npc)
        # trigger release is computed per agent ROW in _step_impl (any agent
        # entering the trigger road releases the block, traffic_manager.py:
        # 74-92 checks every ego); OR-reduce over the agent axis so releases
        # by agents 1..A-1 survive the env canonicalization
        released_env = self._rows_to_EA(npc.released).any(axis=1)
        npc_env = npc_env.replace(released=released_env)
        lb_env = None
        if light_block is not None:
            lb_env = tuple(take0(x) for x in light_block)
        agents = (
            self._rows_to_EA(ego.pos),
            self._rows_to_EA(ego.speed),
            self._rows_to_EA(ego.params.length),
            jnp.ones((E, A), bool),      # corpses keep blocking (delay_done)
        )
        sidx_env = take0(state.sidx)
        expert_actions = expert_mask = None
        if self.config["rl_agent_ratio"] > 0:
            # MixedPGTraffic in MARL: expert NPC obs are assembled against
            # the agent-0 body as "the ego" (the remaining agents are still
            # felt through extra_bodies in the IDM gap scan). Documented
            # approximation, mirrors ops/mixed_traffic.py's single-ego API.
            from metadrive_ped_tpu.ops import mixed_traffic
            ego_env = jax.tree_util.tree_map(take0, ego)
            lidar = self.config["vehicle_config"]["lidar"]
            expert_actions = mixed_traffic.expert_npc_actions(
                self.scene, sidx_env, npc_env, ego_env, self._npc_expert_params,
                num_lasers=lidar["num_lasers"], distance=lidar["distance"],
            )
            expert_mask = self.scene.npc_expert[sidx_env]
        npc_env = idm_ops.step_npcs(
            self.scene, sidx_env, npc_env, None, dt=dt, substeps=rep,
            respawn_mode=self.config["traffic_mode"] in ("respawn", "hybrid"),
            light_block=lb_env, extra_bodies=agents,
            expert_actions=expert_actions, expert_mask=expert_mask,
        )
        return jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, A, axis=0), npc_env
        )

    def _resolve_contacts(self, state, ego, npc, hits, kinds, t_pos, t_heading,
                          t_len, t_wid, frozen):
        """Contact response with duplicated per-row NPC copies: each agent
        row computes its own push against its copy; aggregate the pushes
        over the agent axis so every row sees the same post-contact NPC
        state (one physics world per env, like Bullet)."""
        ego2, npc2 = super()._resolve_contacts(
            state, ego, npc, hits, kinds, t_pos, t_heading, t_len, t_wid, frozen
        )
        if self.scene.npc_lane.shape[1] == 0:
            return ego2, npc2
        A = self.agents_per_env
        push = self._rows_to_EA(npc2.pos - npc.pos).sum(axis=1)       # [E,N,2]
        pos = self._rows_to_EA(npc.pos)[:, 0] + push
        speed = self._rows_to_EA(npc2.speed).min(axis=1)              # worst case
        bcast = lambda x: jnp.repeat(x, A, axis=0)
        return ego2, npc2.replace(pos=bcast(pos), speed=bcast(speed))

    def _extra_vehicle_targets(self, state):
        E, A = self.num_marl_envs, self.agents_per_env
        ego = state.ego
        pos = self._rows_to_EA(ego.pos)            # [E,A,2]
        grp = lambda x: jnp.repeat(x[:, None], A, axis=1).reshape(E * A, A)
        tpos = jnp.repeat(pos[:, None], A, axis=1).reshape(E * A, A, 2)
        theading = grp(self._rows_to_EA(ego.heading))
        tlen = grp(self._rows_to_EA(ego.params.length))
        twid = grp(self._rows_to_EA(ego.params.width))
        alive = self._rows_to_EA(state.dead_timer == 0)
        # corpses still block the road until removed (delay_done semantics):
        # present while dead_timer > -1; removed agents are teleported far
        # away on respawn anyway, so present = True except self
        present = grp(jnp.ones_like(alive))
        self_mask = ~jnp.eye(A, dtype=bool)[None].repeat(E, 0).reshape(E * A, A)
        return tpos, theading, tlen, twid, present & self_mask

    def _freeze_mask(self, state):
        return state.dead_timer > 0

    def _post_done(self, state, terminated, truncated):
        """delay_done bookkeeping + respawn (multi_agent_metadrive.py
        _after_vehicle_done/_respawn_vehicles)."""
        cfg = self.config
        newly_done = (terminated | truncated) & (state.dead_timer == 0)
        timer = jnp.where(newly_done, cfg["delay_done"] + 1, state.dead_timer)
        timer = jnp.maximum(timer - 1, 0)

        if cfg["allow_respawn"]:
            can_respawn = (state.dead_timer == 1) & (timer == 0)
            state = self._respawn(state, can_respawn)
        state = state.replace(dead_timer=timer)
        # dead agents emit no further terminations
        already_dead = state.dead_timer > 0
        terminated = terminated & ~(already_dead & ~newly_done)
        truncated = truncated & ~(already_dead & ~newly_done)
        return state, terminated, truncated

    def _respawn(self, state, mask):
        """Respawn masked rows at a random free slot of their env.

        Occupancy is the reference's box sweep: the 8 x 3 m respawn region
        at the slot must not overlap ANY agent body (rect_region_detection,
        spawn_manager.py:163). Same-step respawns claim slots sequentially
        over the agent axis (spawn_places_used) so no two agents share one.
        """
        E, A = self.num_marl_envs, self.agents_per_env
        SLOT = self.scene.slot_valid.shape[1]
        scene = self.scene
        sidx_env = self._rows_to_EA(state.sidx)[:, 0]
        slot_lane = scene.slot_lane[sidx_env]          # [E,SLOT]
        from metadrive_ped_tpu.ops import collision, lane_geom
        g = lane_geom.gather_lane(scene, sidx_env[:, None], slot_lane)
        slot_pos = lane_geom.position(g, scene.slot_long[sidx_env], jnp.zeros((E, SLOT)))
        slot_heading = lane_geom.heading_theta_at(g, scene.slot_long[sidx_env])
        agent_pos = self._rows_to_EA(state.ego.pos)        # [E,A,2]
        agent_heading = self._rows_to_EA(state.ego.heading)
        agent_len = self._rows_to_EA(state.ego.params.length)
        agent_wid = self._rows_to_EA(state.ego.params.width)
        occupied = collision.obb_obb_overlap(
            slot_pos[:, :, None, :], slot_heading[:, :, None],
            jnp.full((E, SLOT, 1), RESPAWN_REGION_LONGITUDE),
            jnp.full((E, SLOT, 1), RESPAWN_REGION_LATERAL),
            agent_pos[:, None], agent_heading[:, None],
            agent_len[:, None], agent_wid[:, None],
        ).any(axis=2)                                      # [E,SLOT]
        free = scene.slot_valid[sidx_env] & ~occupied

        new_keys = jax.vmap(jax.random.split)(state.rng)
        rng_next, rng_pick = new_keys[:, 0], new_keys[:, 1]
        noise = jax.vmap(lambda k: jax.random.uniform(k, (SLOT,)))(rng_pick)  # [rows,SLOT]
        score = jnp.where(jnp.repeat(free, A, axis=0), noise, -1.0)
        # only respawning rows compete for slots
        score = jnp.where(mask[:, None], score, -1.0)
        score_EA = self._rows_to_EA(score)                 # [E,A,SLOT]

        def claim(taken, score_a):                         # scan over agents
            s = jnp.where(taken, -1.0, score_a)
            best = s.max(axis=1)
            oh = (s == best[:, None]) & (best > 0)[:, None]
            oh = oh & (jnp.cumsum(oh, axis=1) == 1)        # first tie only
            pick = (oh * jnp.arange(SLOT)).sum(axis=1).astype(jnp.int32)
            return taken | oh, (pick, best > 0)

        _, (picks, oks) = jax.lax.scan(
            claim, jnp.zeros((E, SLOT), bool), jnp.moveaxis(score_EA, 1, 0)
        )
        new_slot = jnp.moveaxis(picks, 0, 1).reshape(E * A)
        has_free = jnp.moveaxis(oks, 0, 1).reshape(E * A)

        fresh = self._spawn(rng_next, state.sidx, new_slot.astype(jnp.int32))
        do = mask & has_free
        sel = lambda new, old: jnp.where(
            do.reshape(do.shape + (1,) * (old.ndim - 1)), new, old
        )
        ego = jax.tree_util.tree_map(sel, fresh.ego, state.ego)
        return state.replace(
            ego=ego, rng=rng_next,
            step_count=jnp.where(do, 0, state.step_count),
            episode_reward=jnp.where(do, 0.0, state.episode_reward),
            episode_cost=jnp.where(do, 0.0, state.episode_cost),
            dead_timer=jnp.where(do, 0, state.dead_timer),
            aux=jnp.where(do[:, None], 0.0, state.aux),
        )

    def _reset_mask(self, state, done):
        """Auto-reset an env only when every agent is done/dead ("__all__")."""
        finished = done | (state.dead_timer > 0)
        if self.config["allow_respawn"]:
            # with respawn, the episode only ends at the horizon
            finished = finished & (state.step_count >= self.config["horizon"])
        all_done = self._rows_to_EA(finished).all(axis=1)  # [E]
        return jnp.repeat(all_done, self.agents_per_env)

    # ---- user-facing [E, A, ...] API --------------------------------------
    def reset(self, seed=0):
        obs, info = super().reset(seed)
        return self._rows_to_EA(obs), info

    def step(self, actions):
        if self.config["discrete_action"] and not self.config["use_multi_discrete"]:
            # one integer per agent row; the base class expands it
            # (env_input_policy.py convert_to_continuous_action)
            actions = jnp.asarray(actions).reshape(self.num_envs)
        else:
            actions = jnp.asarray(actions).reshape(self.num_envs, 2)
            if not self.config["discrete_action"]:
                actions = actions.astype(jnp.float32)
        obs, reward, terminated, truncated, info = super().step(actions)
        r = self._rows_to_EA
        info = {k: r(v) if hasattr(v, "shape") and v.shape[:1] == (self.num_envs,) else v
                for k, v in info.items()}
        info["__all__"] = r(terminated | truncated).all(axis=1)
        return r(obs), r(reward), r(terminated), r(truncated), info


class MultiAgentRoundaboutEnv(MultiAgentMetaDrive):
    """MARL roundabout scene (reference: marl_envs/marl_inout_roundabout.py):
    one Roundabout block, 40 agents spawning on all four arms.

    The map is the reference's fixed MARoundaboutMap (marl_inout_roundabout
    .py:27-64): FirstPGBlock(exit_length=60) + Roundabout(random_seed=1,
    exit_radius=10, inner_radius=30, angle=70, EXIT_PART_LENGTH=60)."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(
            dict(
                map="O",  # informational; the real map is custom_blocks below
                num_agents=40,
                map_config=dict(
                    lane_width=3.5, lane_num=2, exit_length=60.0,
                    custom_blocks=[dict(id="O", random_seed=1, config=dict(
                        exit_radius=10.0, inner_radius=30.0, angle=70.0,
                        exit_part_length=60.0,
                    ))],
                ),
                spawn_roads=[
                    (">>", ">>>"),
                    ("-1O0_3_", "-1O0_2_"),
                    ("-1O1_3_", "-1O1_2_"),
                    ("-1O2_3_", "-1O2_2_"),
                ],
            ),
            allow_add_new_key=True,
        )
        return config


class MultiAgentBottleneckEnv(MultiAgentMetaDrive):
    """MARL bottleneck scene (reference: marl_envs/marl_bottleneck.py):
    a 4-lane road bottling to a 1-lane neck and splitting back, 20 agents
    spawning at both 4-lane ends.

    The map is the reference's fixed MABottleneckMap (marl_bottleneck.py:
    28-67): FirstPGBlock(4 lanes, exit_length=60) + Merge(drop 3,
    length=neck_length=20) + Split(add 3, length=60), random_seed=1."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(
            dict(
                map="yY",  # informational; the real map is custom_blocks below
                num_agents=20,
                map_config=dict(
                    lane_width=3.5, lane_num=4, exit_length=60.0,
                    bottle_lane_num=4, neck_lane_num=1, neck_length=20.0,
                    custom_blocks=[
                        dict(id="y", random_seed=1,
                             config=dict(lane_num=3, length=20.0)),
                        dict(id="Y", random_seed=1,
                             config=dict(lane_num=3, length=60.0)),
                    ],
                ),
                spawn_roads=[
                    (">>", ">>>"),
                    ("-2Y0_1_", "-2Y0_0_"),
                ],
                cross_yellow_line_done=True,
                vehicle_config=dict(
                    side_detector=dict(num_lasers=4, distance=50.0),
                    lane_line_detector=dict(num_lasers=4, distance=20.0),
                ),
            ),
            allow_add_new_key=True,
        )
        return config


class MultiAgentBidirectionEnv(MultiAgentMetaDrive):
    """MARL bidirection scene (reference: marl_envs/marl_bidirection.py):
    a shared bidirectional span between two 4-lane approaches, 20 agents
    driven from both ends.

    The map is the reference's fixed MABidirectionMap (marl_bidirection.py:
    29-71): FirstPGBlock(4 lanes, exit_length=60) + Merge(drop 3, length=3)
    + Bidirection + Split(add 3, length=60), random_seed=1."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(
            dict(
                map="yBY",  # informational; the real map is custom_blocks below
                num_agents=20,
                map_config=dict(
                    lane_width=3.5, lane_num=4, exit_length=60.0,
                    bottle_lane_num=4, neck_lane_num=1, neck_length=20.0,
                    custom_blocks=[
                        dict(id="y", random_seed=1,
                             config=dict(lane_num=3, length=3.0)),
                        dict(id="B", random_seed=1),
                        dict(id="Y", random_seed=1,
                             config=dict(lane_num=3, length=60.0)),
                    ],
                ),
                spawn_roads=[
                    (">>", ">>>"),
                    ("-3Y0_1_", "-3Y0_0_"),
                ],
                cross_yellow_line_done=True,
                vehicle_config=dict(
                    side_detector=dict(num_lasers=4, distance=50.0),
                    lane_line_detector=dict(num_lasers=4, distance=20.0),
                ),
            ),
            allow_add_new_key=True,
        )
        return config


class MultiAgentIntersectionEnv(MultiAgentMetaDrive):
    """MARL intersection scene (reference: marl_envs/marl_intersection.py):
    one StdInterSection block, 30 agents spawning on all four arms.

    The map is the reference's fixed MAIntersectionMap (marl_intersection
    .py:27-68): FirstPGBlock(exit_length=60) + InterSection(random_seed=1,
    EXIT_PART_LENGTH=60, enable_u_turn for lane_num>1); agents may route a
    u-turn back out their own arm (MAIntersectionSpawnManager default
    disable_u_turn=False)."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(
            dict(
                map="X",  # informational; the real map is custom_blocks below
                num_agents=30,
                map_config=dict(
                    lane_width=3.5, lane_num=2, exit_length=60.0,
                    custom_blocks=[dict(id="X", random_seed=1, u_turn=True,
                                        config=dict(exit_part_length=60.0))],
                ),
                spawn_roads=[
                    (">>", ">>>"),
                    ("-1X0_1_", "-1X0_0_"),
                    ("-1X1_1_", "-1X1_0_"),
                    ("-1X2_1_", "-1X2_0_"),
                ],
            ),
            allow_add_new_key=True,
        )
        return config

    def _scene_config(self):
        cfg = super()._scene_config()
        cfg["spawn_u_turn_dests"] = True
        return cfg
