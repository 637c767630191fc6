"""Scenario dataset IO.

Mirrors the reference's dataset layout (scenario/utils.py:324-397):
a directory with ``dataset_summary.pkl`` (ordered dict: filename ->
metadata), optional ``dataset_mapping.pkl`` (filename -> relative dir), and
one pickled ScenarioDescription per file.
"""
import os
import pickle

from metadrive_ped_tpu.scenario.description import ScenarioDescription as SD

SUMMARY_FILE = "dataset_summary.pkl"
MAPPING_FILE = "dataset_mapping.pkl"


def read_dataset_summary(directory):
    """Returns (summary_dict, sorted_scenario_ids, mapping)."""
    with open(os.path.join(directory, SUMMARY_FILE), "rb") as f:
        summary = pickle.load(f)
    mapping_path = os.path.join(directory, MAPPING_FILE)
    if os.path.exists(mapping_path):
        with open(mapping_path, "rb") as f:
            mapping = pickle.load(f)
    else:
        mapping = {k: "" for k in summary}
    return summary, list(summary.keys()), mapping


def read_scenario_data(path):
    with open(path, "rb") as f:
        sd = pickle.load(f)
    return SD(sd)


def load_scenarios(directory, start_index=0, num=None, worker_index=0, num_workers=1):
    """Load a dataset slice with the reference's multi-worker striding
    (manager/scenario_data_manager.py:26-32):
    indices = range(start + worker_index, start + num, num_workers)."""
    summary, ids, mapping = read_dataset_summary(directory)
    num = num if num is not None else len(ids) - start_index
    indices = range(start_index + worker_index, start_index + num, num_workers)
    out = []
    for i in indices:
        fname = ids[i]
        out.append(read_scenario_data(os.path.join(directory, mapping.get(fname, ""), fname)))
    return out


def save_dataset(scenarios, directory):
    """Write ScenarioDescriptions as a loadable dataset directory."""
    os.makedirs(directory, exist_ok=True)
    summary, mapping = {}, {}
    for i, sd in enumerate(scenarios):
        fname = f"sd_{i}.pkl"
        with open(os.path.join(directory, fname), "wb") as f:
            pickle.dump(dict(sd), f)
        summary[fname] = {"length": sd[SD.LENGTH], "id": sd[SD.ID]}
        mapping[fname] = ""
    with open(os.path.join(directory, SUMMARY_FILE), "wb") as f:
        pickle.dump(summary, f)
    with open(os.path.join(directory, MAPPING_FILE), "wb") as f:
        pickle.dump(mapping, f)
    return directory
