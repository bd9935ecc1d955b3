from dpvo_tpu.runtime.dpvo import DPVO  # noqa: F401
from dpvo_tpu.runtime.state import VOState, make_state  # noqa: F401
from dpvo_tpu.runtime.steps import StepFunctions  # noqa: F401
from dpvo_tpu.runtime.topology import EdgeSet, Topology, neighbors  # noqa: F401
from dpvo_tpu.runtime.weights import init_params, load_params, save_params  # noqa: F401
