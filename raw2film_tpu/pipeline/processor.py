"""Placeholder; real Processor lands with the pipeline module."""
class Processor:
    pass
