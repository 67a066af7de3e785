from zipvoice_tpu.vocoder.vocos import Vocos, convert_vocos_state_dict  # noqa: F401
