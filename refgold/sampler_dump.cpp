// Dumps golden sample sequences from the reference pbrt-v3 samplers for
// parity unit tests (tests/test_sampler_goldens.py).
//
// For each sampler, for each pixel of a 4x4 block at several image offsets
// and each sampleIndex < spp, we record the stream in pbrt's real
// consumption order: GetCameraSample (pFilm 2D, time 1D, pLens 2D =
// 5 dims), then NUM2D Get2D pairs, then NUM1D Get1D values — mirroring
// core/sampler.cpp:46-52 and the PixelSampler/GlobalSampler dimension
// machinery (core/sampler.cpp:89-196).
//
// Output: one raw little-endian f32 file per sampler,
//   layout [nPixels, spp, 5 + 2*NUM2D + NUM1D]
// plus a stdout manifest line per file.
#include <cstdio>
#include <cstring>
#include <memory>
#include <vector>

#include "pbrt.h"
#include "camera.h"
#include "sampler.h"
#include "paramset.h"
#include "samplers/halton.h"
#include "samplers/sobol.h"
#include "samplers/stratified.h"
#include "samplers/zerotwosequence.h"
#include "samplers/maxmin.h"
#include "samplers/random.h"

using namespace pbrt;

static const int SPP = 16;
static const int NUM2D = 10;
static const int NUM1D = 10;

int main(int argc, char **argv) {
    const char *outdir = argc > 1 ? argv[1] : ".";
    // Image/sample bounds like a 64x64 render (GetSampleBounds with the
    // default box filter of radius 0.5 gives exactly the pixel bounds).
    Bounds2i sampleBounds(Point2i(0, 0), Point2i(64, 64));

    std::vector<Point2i> pixels;
    int offs[3][2] = {{0, 0}, {17, 5}, {60, 62}};  // interior + edge cases
    for (auto &o : offs)
        for (int dy = 0; dy < 2; ++dy)
            for (int dx = 0; dx < 2; ++dx)
                pixels.push_back(Point2i(std::min(o[0] + dx, 63),
                                         std::min(o[1] + dy, 63)));

    struct Entry { const char *name; Sampler *s; };
    std::vector<Entry> entries;
    entries.push_back({"halton",
        new HaltonSampler(SPP, sampleBounds)});
    entries.push_back({"sobol",
        new SobolSampler(SPP, sampleBounds)});
    // 4x4 jittered strata = 16 spp; enough sampled dims for our stream.
    entries.push_back({"stratified",
        new StratifiedSampler(4, 4, true, NUM1D + 2 * NUM2D + 5)});
    entries.push_back({"zerotwosequence",
        new ZeroTwoSequenceSampler(SPP, NUM1D + 2 * NUM2D + 5)});
    entries.push_back({"maxmindist",
        new MaxMinDistSampler(SPP, NUM1D + 2 * NUM2D + 5)});
    entries.push_back({"random",
        new RandomSampler(SPP)});

    for (auto &e : entries) {
        const int stride = 5 + 2 * NUM2D + NUM1D;
        std::vector<float> out;
        out.reserve(pixels.size() * SPP * stride);
        for (Point2i p : pixels) {
            e.s->StartPixel(p);
            do {
                CameraSample cs = e.s->GetCameraSample(p);
                out.push_back((float)cs.pFilm.x);
                out.push_back((float)cs.pFilm.y);
                out.push_back((float)cs.time);
                out.push_back((float)cs.pLens.x);
                out.push_back((float)cs.pLens.y);
                for (int i = 0; i < NUM2D; ++i) {
                    Point2f u = e.s->Get2D();
                    out.push_back((float)u.x);
                    out.push_back((float)u.y);
                }
                for (int i = 0; i < NUM1D; ++i)
                    out.push_back((float)e.s->Get1D());
            } while (e.s->StartNextSample());
        }
        char path[512];
        snprintf(path, sizeof(path), "%s/sampler_%s.f32", outdir, e.name);
        FILE *f = fopen(path, "wb");
        fwrite(out.data(), sizeof(float), out.size(), f);
        fclose(f);
        printf("%s shape=[%zu,%d,%d]\n", path, pixels.size(), SPP, stride);
    }

    // Also dump the raw per-dimension Halton/Sobol global sequences:
    // value[dim][sampleIndex] for global index 0..255, dims 0..31 — the
    // cleanest parity target for the low-discrepancy bit-math itself.
    {
        HaltonSampler hs(SPP, sampleBounds);
        SobolSampler ss(SPP, sampleBounds);
        struct GEntry { const char *name; GlobalSampler *g; };
        GEntry gs[2] = {{"halton_dims", &hs}, {"sobol_dims", &ss}};
        for (auto &ge : gs) {
            std::vector<float> out;
            for (int dim = 0; dim < 32; ++dim)
                for (int64_t idx = 0; idx < 256; ++idx)
                    out.push_back((float)ge.g->SampleDimension(idx, dim));
            char path[512];
            snprintf(path, sizeof(path), "%s/%s.f32", outdir, ge.name);
            FILE *f = fopen(path, "wb");
            fwrite(out.data(), sizeof(float), out.size(), f);
            fclose(f);
            printf("%s shape=[32,256]\n", path);
        }
    }
    return 0;
}
