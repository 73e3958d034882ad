"""Key / ciphertext / parameter (de)serialization.

The reference has NO serialization at all (SURVEY.md §5) — every cross-host
workflow needs it, so it is a first-class component here. Format: numpy .npz
containers (portable, zero-copy friendly) with a JSON params header.

Covered: RlweParams/CkksParams/BgvParams, RlweSk, RnsPoly, CkksCt/CkksPt,
BgvCt, RgswCt (key-switching keys), TFHE key material.
"""

from __future__ import annotations

import dataclasses
import io
import json
from typing import Any, Dict

import numpy as np

from hehub_tpu.core import rns
from hehub_tpu.core.context import BgvParams, CkksParams, RlweParams
from hehub_tpu.models import bgv as bgv_mod
from hehub_tpu.models import ckks as ckks_mod
from hehub_tpu.rlwe import rgsw as rgsw_mod
from hehub_tpu.rlwe import rlwe as rlwe_mod

_PARAM_TYPES = {
    "RlweParams": RlweParams,
    "CkksParams": CkksParams,
    "BgvParams": BgvParams,
}


def params_to_json(params: RlweParams) -> str:
    d = dataclasses.asdict(params)
    d["__type__"] = type(params).__name__
    return json.dumps(d)


def params_from_json(s: str) -> RlweParams:
    d = json.loads(s)
    cls = _PARAM_TYPES[d.pop("__type__")]
    d["moduli"] = tuple(d["moduli"])
    if isinstance(d.get("special_mod"), list):
        d["special_mod"] = tuple(d["special_mod"])
    return cls(**d)


def _meta(obj) -> Dict[str, Any]:
    if isinstance(obj, rns.RnsPoly):
        return {"kind": "RnsPoly", "form": obj.form, "limb_ids": list(obj.limb_ids)}
    if isinstance(obj, ckks_mod.CkksCt):
        return {"kind": "CkksCt", "scale": obj.scaling_factor,
                "form": obj.c0.form, "limb_ids": list(obj.c0.limb_ids)}
    if isinstance(obj, ckks_mod.CkksPt):
        return {"kind": "CkksPt", "scale": obj.scaling_factor,
                "form": obj.poly.form, "limb_ids": list(obj.poly.limb_ids)}
    if isinstance(obj, bgv_mod.BgvCt):
        return {"kind": "BgvCt", "t": obj.plain_modulus,
                "form": obj.c0.form, "limb_ids": list(obj.c0.limb_ids)}
    if isinstance(obj, rgsw_mod.RgswCt):
        return {"kind": "RgswCt", "limb_ids": list(obj.limb_ids),
                "alpha": obj.alpha}
    if isinstance(obj, rlwe_mod.RlweSk):
        return {"kind": "RlweSk"}
    from hehub_tpu.models import tfhe as tfhe_mod

    if isinstance(obj, tfhe_mod.TfheKeys):
        return {"kind": "TfheKeys"}
    if isinstance(obj, tfhe_mod.LweCt):
        return {"kind": "LweCt"}
    raise TypeError(f"unsupported object {type(obj)}")


def _arrays(obj) -> Dict[str, np.ndarray]:
    if isinstance(obj, rns.RnsPoly):
        return {"data": np.asarray(obj.data)}
    if isinstance(obj, (ckks_mod.CkksCt, bgv_mod.BgvCt)):
        return {"c0": np.asarray(obj.c0.data), "c1": np.asarray(obj.c1.data)}
    if isinstance(obj, ckks_mod.CkksPt):
        return {"data": np.asarray(obj.poly.data)}
    if isinstance(obj, rgsw_mod.RgswCt):
        return {"data": np.asarray(obj.data)}
    if isinstance(obj, rlwe_mod.RlweSk):
        return {"coeffs": obj.coeffs, "ntt": obj.ntt, "ntt_sh": obj.ntt_sh}
    from hehub_tpu.models import tfhe as tfhe_mod

    if isinstance(obj, tfhe_mod.TfheKeys):
        d = {"lwe_s": np.asarray(obj.lwe_s), "bsk": np.asarray(obj.bsk),
             "ksk_a": np.asarray(obj.ksk_a), "ksk_a_sh": np.asarray(obj.ksk_a_sh),
             "ksk_b": np.asarray(obj.ksk_b), "ksk_b_sh": np.asarray(obj.ksk_b_sh)}
        d.update({f"sk_{k}": v for k, v in _arrays(obj.rlwe_sk).items()})
        return d
    if isinstance(obj, tfhe_mod.LweCt):
        return {"a": np.asarray(obj.a), "b": np.asarray(obj.b)}
    raise TypeError(f"unsupported object {type(obj)}")


def save(path_or_file, obj, params: RlweParams) -> None:
    meta = _meta(obj)
    arrs = _arrays(obj)
    np.savez_compressed(
        path_or_file,
        __meta__=np.frombuffer(
            json.dumps({"meta": meta, "params": json.loads(params_to_json(params))})
            .encode(),
            dtype=np.uint8,
        ),
        **arrs,
    )


def load(path_or_file):
    """Returns (object, params)."""
    z = np.load(path_or_file)
    blob = json.loads(bytes(z["__meta__"]).decode())
    meta = blob["meta"]
    pd = blob["params"]
    cls = _PARAM_TYPES[pd.pop("__type__")]
    pd["moduli"] = tuple(pd["moduli"])
    if isinstance(pd.get("special_mod"), list):
        pd["special_mod"] = tuple(pd["special_mod"])
    params = cls(**pd)
    kind = meta["kind"]
    if kind == "RnsPoly":
        obj = rns.RnsPoly(z["data"], meta["form"], tuple(meta["limb_ids"]))
    elif kind == "CkksCt":
        ids = tuple(meta["limb_ids"])
        obj = ckks_mod.CkksCt(
            rns.RnsPoly(z["c0"], meta["form"], ids),
            rns.RnsPoly(z["c1"], meta["form"], ids),
            meta["scale"],
        )
    elif kind == "CkksPt":
        obj = ckks_mod.CkksPt(
            rns.RnsPoly(z["data"], meta["form"], tuple(meta["limb_ids"])),
            meta["scale"],
        )
    elif kind == "BgvCt":
        ids = tuple(meta["limb_ids"])
        obj = bgv_mod.BgvCt(
            rns.RnsPoly(z["c0"], meta["form"], ids),
            rns.RnsPoly(z["c1"], meta["form"], ids),
            meta["t"],
        )
    elif kind == "RgswCt":
        obj = rgsw_mod.RgswCt(z["data"], tuple(meta["limb_ids"]),
                              meta.get("alpha", 1))
    elif kind == "RlweSk":
        obj = rlwe_mod.RlweSk(z["coeffs"], z["ntt"], z["ntt_sh"])
    elif kind == "TfheKeys":
        from hehub_tpu.models import tfhe as tfhe_mod

        obj = tfhe_mod.TfheKeys(
            z["lwe_s"],
            rlwe_mod.RlweSk(z["sk_coeffs"], z["sk_ntt"], z["sk_ntt_sh"]),
            z["bsk"], z["ksk_a"], z["ksk_a_sh"], z["ksk_b"], z["ksk_b_sh"],
        )
    elif kind == "LweCt":
        from hehub_tpu.models import tfhe as tfhe_mod

        obj = tfhe_mod.LweCt(z["a"], z["b"])
    else:
        raise ValueError(f"unknown kind {kind}")
    return obj, params
