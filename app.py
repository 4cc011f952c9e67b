"""Application entry point: ``python app.py`` starts the web demo.

Parity with the reference's boot command (reference app.py:86-92 runs the
Dash server on port 8050 with a ``--debug`` flag).  This framework's app is
the stdlib web server in image_generation_tpu/app/server.py — same
architecture (UI process + background training processes + file IPC), no
web-framework dependencies.
"""

from image_generation_tpu.app.server import main

if __name__ == "__main__":
    main()
