// Minimal OpenEXR stub so the reference's core/imageio.cpp compiles without
// the absent openexr submodule.  EXR read/write throws at runtime; the
// golden pipeline uses PFM output only (imageio.cpp WritePfm path).
#ifndef PBRT_SHIM_IMF_RGBA_H
#define PBRT_SHIM_IMF_RGBA_H

#include <cstddef>
#include <stdexcept>

namespace Imath {
struct V2i {
    int x, y;
    V2i(int x = 0, int y = 0) : x(x), y(y) {}
};
struct Box2i {
    V2i min, max;
    Box2i() {}
    Box2i(V2i a, V2i b) : min(a), max(b) {}
};
}  // namespace Imath

namespace Imf {
struct Rgba {
    float r, g, b, a;
    Rgba(float r = 0, float g = 0, float b = 0, float a = 1)
        : r(r), g(g), b(b), a(a) {}
};
enum RgbaChannels { WRITE_RGB = 0, WRITE_RGBA = 1 };
}  // namespace Imf

#endif
