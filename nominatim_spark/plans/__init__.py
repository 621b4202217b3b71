"""Query plans: the driver-facing gate registry and the geocoding pipelines."""
