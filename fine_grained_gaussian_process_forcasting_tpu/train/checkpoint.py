"""Orbax checkpointing keyed by model name.

Equivalent of the reference's best-validation ``torch.save(state_dict)``
(``train.py:181-187``) / ``torch.load`` (``evaluate.py:120-125``), with the
model_name encoding the full ablation config (``train.py:50-56``).  Unlike
the reference, optimizer state can be checkpointed too, enabling true
resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(model_path: str, model_name: str, params: Any,
                    opt_state: Optional[Any] = None) -> str:
    """Atomic best-checkpoint save: write to a temp sibling, then rename
    over the old directory, so a crash mid-save never loses the previous
    best."""
    import shutil

    path = os.path.abspath(os.path.join(model_path, model_name))
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(tmp, payload)
    ckptr.wait_until_finished()
    old = path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return path


def load_checkpoint(model_path: str, model_name: str,
                    template: Optional[Any] = None) -> Any:
    path = os.path.abspath(os.path.join(model_path, model_name))
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)
