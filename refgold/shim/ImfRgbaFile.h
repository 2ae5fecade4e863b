// OpenEXR file-API stub (see ImfRgba.h).  Any EXR I/O attempt throws; the
// golden pipeline writes PFM instead.
#ifndef PBRT_SHIM_IMF_RGBA_FILE_H
#define PBRT_SHIM_IMF_RGBA_FILE_H

#include "ImfRgba.h"

namespace Imf {

class RgbaInputFile {
  public:
    explicit RgbaInputFile(const char *) {
        throw std::runtime_error("EXR unsupported in refgold build");
    }
    Imath::Box2i dataWindow() const { return {}; }
    Imath::Box2i displayWindow() const { return {}; }
    void setFrameBuffer(Rgba *, size_t, size_t) {}
    void readPixels(int, int) {}
};

class RgbaOutputFile {
  public:
    RgbaOutputFile(const char *, const Imath::Box2i &, const Imath::Box2i &,
                   RgbaChannels) {
        throw std::runtime_error("EXR unsupported in refgold build");
    }
    void setFrameBuffer(const Rgba *, size_t, size_t) {}
    void writePixels(int) {}
};

}  // namespace Imf

#endif
