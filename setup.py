from setuptools import setup, find_packages

setup(
    name="magnet_tpu",
    version="0.1.0",
    packages=find_packages(include=["magnet_tpu*"]),
    python_requires=">=3.10",
)
