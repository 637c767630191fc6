from metadrive_ped_tpu.scenario.description import ScenarioDescription
from metadrive_ped_tpu.scenario.recorder import export_scenarios

__all__ = ["ScenarioDescription", "export_scenarios"]
