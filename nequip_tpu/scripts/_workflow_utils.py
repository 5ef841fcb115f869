"""Global workflow-state flag consulted by model loaders.

Parity: ``/root/reference/nequip/scripts/_workflow_utils.py``.
"""

_WORKFLOW_STATE = None


def set_workflow_state(state):
    global _WORKFLOW_STATE
    assert state in ("train", "package", "compile", None)
    _WORKFLOW_STATE = state


def get_workflow_state():
    return _WORKFLOW_STATE
