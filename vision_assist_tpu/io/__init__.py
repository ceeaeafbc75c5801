from vision_assist_tpu.io.scenarios import load_scenario, scenario_names

__all__ = ["load_scenario", "scenario_names"]
