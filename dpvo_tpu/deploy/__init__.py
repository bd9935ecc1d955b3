from dpvo_tpu.deploy.export import (export_network, load_exported,  # noqa: F401
                                    ExportedVONet)
