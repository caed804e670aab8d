"""Offline database builders: convert downloaded source datasets
(NeRF-LLFF zip, RealEstate-10K camera files, DTU pixelNeRF/RegNeRF archives)
into the framework's on-disk database layout."""
