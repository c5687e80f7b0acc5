#!/usr/bin/env python3
"""roslaunch entrypoint (launch/gvom_node.launch names type="node.py").

Thin shim over gvom_tpu.ros.node.main so catkin_install_python has a script
target; the package itself ships on the PYTHONPATH (pip or catkin venv)."""

from gvom_tpu.ros.node import main

if __name__ == "__main__":
    main()
