from .srb_harness import SRBClosedLoopHarness

__all__ = ["SRBClosedLoopHarness"]
