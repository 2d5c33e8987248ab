from setuptools import setup, find_packages

setup(
    name="pysolvers_tpu",
    version="0.1.0",
    description=("TPU-native sparse linear-algebra and iterative-solver "
                 "framework (JAX/XLA/Pallas)"),
    packages=find_packages(include=["pysolvers_tpu", "pysolvers_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["numpy", "jax"],
)
