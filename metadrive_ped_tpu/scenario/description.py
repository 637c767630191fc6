"""ScenarioDescription — the nested-dict scenario data schema.

Key names and nesting mirror the reference exactly
(metadrive/scenario/scenario_description.py:124-200) so datasets produced by
either implementation interoperate: top level {tracks, version, id,
dynamic_map_states, map_features, length, metadata}; each track
{type, state{position[T,3], heading[T], velocity[T,2], valid[T], length,
width, height}, metadata}.
"""
import numpy as np


class ScenarioDescription(dict):
    TRACKS = "tracks"
    VERSION = "version"
    ID = "id"
    DYNAMIC_MAP_STATES = "dynamic_map_states"
    MAP_FEATURES = "map_features"
    LENGTH = "length"
    METADATA = "metadata"
    FIRST_LEVEL_KEYS = {TRACKS, VERSION, ID, DYNAMIC_MAP_STATES, MAP_FEATURES, LENGTH, METADATA}

    TYPE = "type"
    STATE = "state"
    STATE_DICT_KEYS = {TYPE, STATE, METADATA}

    POSITION = "position"
    HEADING = "heading"
    VELOCITY = "velocity"
    VALID = "valid"

    METADRIVE_PROCESSED = "metadrive_processed"
    COORDINATE = "coordinate"
    TIMESTEP = "ts"
    METADATA_KEYS = {METADRIVE_PROCESSED, COORDINATE, TIMESTEP}

    SDC_ID = "sdc_id"

    COORDINATE_METADRIVE = "metadrive"

    @classmethod
    def sanity_check(cls, d):
        """Schema/shape validation (scenario_description.py:200-322)."""
        assert cls.FIRST_LEVEL_KEYS.issubset(d.keys()), (
            f"missing keys: {cls.FIRST_LEVEL_KEYS - set(d.keys())}"
        )
        T = d[cls.LENGTH]
        assert isinstance(d[cls.TRACKS], dict)
        for obj_id, tr in d[cls.TRACKS].items():
            assert cls.STATE_DICT_KEYS.issubset(tr.keys()), (obj_id, tr.keys())
            st = tr[cls.STATE]
            assert np.asarray(st[cls.POSITION]).shape == (T, 3), obj_id
            assert np.asarray(st[cls.HEADING]).shape == (T,), obj_id
            assert np.asarray(st[cls.VELOCITY]).shape == (T, 2), obj_id
            assert np.asarray(st[cls.VALID]).shape == (T,), obj_id
        md = d[cls.METADATA]
        assert cls.METADATA_KEYS.issubset(md.keys())
        assert np.asarray(md[cls.TIMESTEP]).shape == (T,)
        return True


# MetaDriveType object-type strings shared with the ScenarioNet data format
# (reference: metadrive/type.py)
class MetaDriveType:
    VEHICLE = "VEHICLE"
    PEDESTRIAN = "PEDESTRIAN"
    CYCLIST = "CYCLIST"
    TRAFFIC_CONE = "TRAFFIC_CONE"
    TRAFFIC_BARRIER = "TRAFFIC_BARRIER"
    LANE_SURFACE_STREET = "LANE_SURFACE_STREET"
    LINE_BROKEN_SINGLE_WHITE = "ROAD_LINE_BROKEN_SINGLE_WHITE"
    LINE_SOLID_SINGLE_WHITE = "ROAD_LINE_SOLID_SINGLE_WHITE"
    LINE_SOLID_SINGLE_YELLOW = "ROAD_LINE_SOLID_SINGLE_YELLOW"
    BOUNDARY_LINE = "ROAD_EDGE_BOUNDARY"
    BOUNDARY_SIDEWALK = "ROAD_EDGE_SIDEWALK"
