from .srb_harness import SRBClosedLoopHarness

__all__ = ["SRBClosedLoopHarness"]


def __getattr__(name):
    # Lazy imports: mujoco-dependent pieces load on demand.
    if name == "QuadrupedEnv":
        from .mujoco_env import QuadrupedEnv
        return QuadrupedEnv
    if name == "run_simulation":
        from .simulation import run_simulation
        return run_simulation
    if name == "run_batched_simulations":
        from .batched import run_batched_simulations
        return run_batched_simulations
    raise AttributeError(name)
