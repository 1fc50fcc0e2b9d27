from nbodysim_tpu.diagnostics.metrics import diagnostics, system_metrics, EnergyTracker

__all__ = ["diagnostics", "system_metrics", "EnergyTracker"]
