from examples.ldc.ldc_solver import LDCConfig, LDCSolver, build_pressure_matrix

__all__ = ["LDCConfig", "LDCSolver", "build_pressure_matrix"]
