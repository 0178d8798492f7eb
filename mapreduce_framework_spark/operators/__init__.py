"""Engine-level operators built from DataFrame primitives.

Each is a reusable building block with a documented 100 TB posture;
queries/*.py compose them into the declared inventory.
"""
