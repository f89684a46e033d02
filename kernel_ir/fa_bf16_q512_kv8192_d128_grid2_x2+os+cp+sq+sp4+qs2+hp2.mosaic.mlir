module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x2x512x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x2x8192x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x2x8192x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x2x512x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<1024x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<1024x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<1024x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 2, 16, 1>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 2, 512, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 2, 8192, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 2, 8192, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 2, 512, 128>}]} {
    %cst = arith.constant dense<0.000000e+00> : vector<256x1xf32>
    %cst_0 = arith.constant dense<0.127517432> : vector<512x128xf32>
    %c768 = arith.constant 768 : index
    %c512 = arith.constant 512 : index
    %c1 = arith.constant 1 : index
    %c256 = arith.constant 256 : index
    %cst_1 = arith.constant dense<0.000000e+00> : vector<256x128xf32>
    %cst_2 = arith.constant dense<0.000000e+00> : vector<256xf32>
    %cst_3 = arith.constant dense<0xFF800000> : vector<256xf32>
    %cst_4 = arith.constant dense<0.000000e+00> : vector<256x2048xf32>
    %c0 = arith.constant 0 : index
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %2 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x2x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %3 = vector.shape_cast %2 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %4 = arith.extf %3 : vector<512x128xbf16> to vector<512x128xf32>
    %5 = arith.mulf %4, %cst_0 : vector<512x128xf32>
    %6 = arith.truncf %5 : vector<512x128xf32> to vector<512x128xbf16>
    %7 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x2x8192x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x8192x128xbf16>
    %8 = vector.shape_cast %7 : vector<1x1x8192x128xbf16> to vector<8192x128xbf16>
    %9 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x2x8192x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x8192x128xbf16>
    %10 = vector.shape_cast %9 : vector<1x1x8192x128xbf16> to vector<8192x128xbf16>
    %11 = vector.extract_strided_slice %6 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    scf.if %0 {
      %28 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %29 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %30 = tpu.matmul %11, %28, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %31 = vector.multi_reduction <maximumf>, %30, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %32 = vector.shape_cast %31 : vector<256xf32> to vector<256x1xf32>
      %33 = vector.broadcast %32 : vector<256x1xf32> to vector<256x2048xf32>
      %34 = arith.subf %30, %33 : vector<256x2048xf32>
      %35 = math.exp2 %34 : vector<256x2048xf32>
      %36 = arith.truncf %35 : vector<256x2048xf32> to vector<256x2048xbf16>
      %37 = vector.multi_reduction <add>, %35, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %38 = vector.shape_cast %37 : vector<256xf32> to vector<256x1xf32>
      %39 = tpu.matmul %36, %29, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %40 = vector.extract_strided_slice %8 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %41 = vector.extract_strided_slice %10 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %42 = tpu.matmul %11, %40, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %43 = vector.multi_reduction <maximumf>, %42, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %44 = vector.shape_cast %43 : vector<256xf32> to vector<256x1xf32>
      %45 = vector.broadcast %44 : vector<256x1xf32> to vector<256x2048xf32>
      %46 = arith.subf %42, %45 : vector<256x2048xf32>
      %47 = math.exp2 %46 : vector<256x2048xf32>
      %48 = arith.truncf %47 : vector<256x2048xf32> to vector<256x2048xbf16>
      %49 = vector.multi_reduction <add>, %47, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %50 = vector.shape_cast %49 : vector<256xf32> to vector<256x1xf32>
      %51 = tpu.matmul %48, %41, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %52 = vector.extract_strided_slice %8 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %53 = vector.extract_strided_slice %10 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %54 = tpu.matmul %11, %52, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %55 = vector.multi_reduction <maximumf>, %54, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %56 = vector.shape_cast %55 : vector<256xf32> to vector<256x1xf32>
      %57 = vector.broadcast %56 : vector<256x1xf32> to vector<256x2048xf32>
      %58 = arith.subf %54, %57 : vector<256x2048xf32>
      %59 = math.exp2 %58 : vector<256x2048xf32>
      %60 = arith.truncf %59 : vector<256x2048xf32> to vector<256x2048xbf16>
      %61 = vector.multi_reduction <add>, %59, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %62 = vector.shape_cast %61 : vector<256xf32> to vector<256x1xf32>
      %63 = tpu.matmul %60, %53, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %64 = vector.extract_strided_slice %8 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %65 = vector.extract_strided_slice %10 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %66 = tpu.matmul %11, %64, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %67 = vector.multi_reduction <maximumf>, %66, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %68 = vector.shape_cast %67 : vector<256xf32> to vector<256x1xf32>
      %69 = vector.broadcast %68 : vector<256x1xf32> to vector<256x2048xf32>
      %70 = arith.subf %66, %69 : vector<256x2048xf32>
      %71 = math.exp2 %70 : vector<256x2048xf32>
      %72 = arith.truncf %71 : vector<256x2048xf32> to vector<256x2048xbf16>
      %73 = vector.multi_reduction <add>, %71, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %74 = vector.shape_cast %73 : vector<256xf32> to vector<256x1xf32>
      %75 = tpu.matmul %72, %65, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %76 = arith.maximumf %32, %44 : vector<256x1xf32>
      %77 = arith.maximumf %76, %56 : vector<256x1xf32>
      %78 = arith.maximumf %77, %68 : vector<256x1xf32>
      %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x128xf32>
      %80 = arith.subf %32, %78 : vector<256x1xf32>
      %81 = math.exp2 %80 : vector<256x1xf32>
      %82 = arith.mulf %38, %81 : vector<256x1xf32>
      %83 = arith.addf %82, %cst : vector<256x1xf32>
      %84 = vector.broadcast %81 : vector<256x1xf32> to vector<256x128xf32>
      %85 = arith.mulf %39, %84 : vector<256x128xf32>
      %86 = arith.addf %85, %cst_1 : vector<256x128xf32>
      %87 = arith.subf %44, %78 : vector<256x1xf32>
      %88 = math.exp2 %87 : vector<256x1xf32>
      %89 = arith.mulf %50, %88 : vector<256x1xf32>
      %90 = arith.addf %83, %89 : vector<256x1xf32>
      %91 = vector.broadcast %88 : vector<256x1xf32> to vector<256x128xf32>
      %92 = arith.mulf %51, %91 : vector<256x128xf32>
      %93 = arith.addf %86, %92 : vector<256x128xf32>
      %94 = arith.subf %56, %78 : vector<256x1xf32>
      %95 = math.exp2 %94 : vector<256x1xf32>
      %96 = arith.mulf %62, %95 : vector<256x1xf32>
      %97 = arith.addf %90, %96 : vector<256x1xf32>
      %98 = vector.broadcast %95 : vector<256x1xf32> to vector<256x128xf32>
      %99 = arith.mulf %63, %98 : vector<256x128xf32>
      %100 = arith.addf %93, %99 : vector<256x128xf32>
      %101 = arith.subf %68, %78 : vector<256x1xf32>
      %102 = math.exp2 %101 : vector<256x1xf32>
      %103 = arith.mulf %74, %102 : vector<256x1xf32>
      %104 = arith.addf %97, %103 : vector<256x1xf32>
      %105 = vector.broadcast %102 : vector<256x1xf32> to vector<256x128xf32>
      %106 = arith.mulf %75, %105 : vector<256x128xf32>
      %107 = arith.addf %100, %106 : vector<256x128xf32>
      %108 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %79 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %108 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %107 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %12 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %12 {
      %28 = vector.load %arg9[%c0, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %29 = vector.load %arg10[%c0, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %30 = vector.load %arg8[%c0, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %31 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %32 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %33 = tpu.matmul %11, %31, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %34 = vector.multi_reduction <maximumf>, %33, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %35 = vector.shape_cast %34 : vector<256xf32> to vector<256x1xf32>
      %36 = vector.broadcast %35 : vector<256x1xf32> to vector<256x2048xf32>
      %37 = arith.subf %33, %36 : vector<256x2048xf32>
      %38 = math.exp2 %37 : vector<256x2048xf32>
      %39 = arith.truncf %38 : vector<256x2048xf32> to vector<256x2048xbf16>
      %40 = vector.multi_reduction <add>, %38, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %41 = vector.shape_cast %40 : vector<256xf32> to vector<256x1xf32>
      %42 = tpu.matmul %39, %32, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %43 = vector.extract_strided_slice %8 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %44 = vector.extract_strided_slice %10 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %45 = tpu.matmul %11, %43, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %46 = vector.multi_reduction <maximumf>, %45, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %47 = vector.shape_cast %46 : vector<256xf32> to vector<256x1xf32>
      %48 = vector.broadcast %47 : vector<256x1xf32> to vector<256x2048xf32>
      %49 = arith.subf %45, %48 : vector<256x2048xf32>
      %50 = math.exp2 %49 : vector<256x2048xf32>
      %51 = arith.truncf %50 : vector<256x2048xf32> to vector<256x2048xbf16>
      %52 = vector.multi_reduction <add>, %50, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %53 = vector.shape_cast %52 : vector<256xf32> to vector<256x1xf32>
      %54 = tpu.matmul %51, %44, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %55 = vector.extract_strided_slice %8 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %56 = vector.extract_strided_slice %10 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %57 = tpu.matmul %11, %55, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %58 = vector.multi_reduction <maximumf>, %57, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %59 = vector.shape_cast %58 : vector<256xf32> to vector<256x1xf32>
      %60 = vector.broadcast %59 : vector<256x1xf32> to vector<256x2048xf32>
      %61 = arith.subf %57, %60 : vector<256x2048xf32>
      %62 = math.exp2 %61 : vector<256x2048xf32>
      %63 = arith.truncf %62 : vector<256x2048xf32> to vector<256x2048xbf16>
      %64 = vector.multi_reduction <add>, %62, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %65 = vector.shape_cast %64 : vector<256xf32> to vector<256x1xf32>
      %66 = tpu.matmul %63, %56, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %67 = vector.extract_strided_slice %8 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %68 = vector.extract_strided_slice %10 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %69 = tpu.matmul %11, %67, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %70 = vector.multi_reduction <maximumf>, %69, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %71 = vector.shape_cast %70 : vector<256xf32> to vector<256x1xf32>
      %72 = vector.broadcast %71 : vector<256x1xf32> to vector<256x2048xf32>
      %73 = arith.subf %69, %72 : vector<256x2048xf32>
      %74 = math.exp2 %73 : vector<256x2048xf32>
      %75 = arith.truncf %74 : vector<256x2048xf32> to vector<256x2048xbf16>
      %76 = vector.multi_reduction <add>, %74, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %77 = vector.shape_cast %76 : vector<256xf32> to vector<256x1xf32>
      %78 = tpu.matmul %75, %68, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %79 = arith.maximumf %35, %47 : vector<256x1xf32>
      %80 = arith.maximumf %79, %59 : vector<256x1xf32>
      %81 = arith.maximumf %80, %71 : vector<256x1xf32>
      %82 = vector.broadcast %81 : vector<256x1xf32> to vector<256x128xf32>
      %83 = arith.maximumf %28, %82 : vector<256x128xf32>
      %84 = vector.extract_strided_slice %83 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %85 = arith.subf %28, %83 : vector<256x128xf32>
      %86 = math.exp2 %85 : vector<256x128xf32>
      %87 = arith.subf %35, %84 : vector<256x1xf32>
      %88 = math.exp2 %87 : vector<256x1xf32>
      %89 = arith.mulf %41, %88 : vector<256x1xf32>
      %90 = arith.addf %89, %cst : vector<256x1xf32>
      %91 = vector.broadcast %88 : vector<256x1xf32> to vector<256x128xf32>
      %92 = arith.mulf %42, %91 : vector<256x128xf32>
      %93 = arith.addf %92, %cst_1 : vector<256x128xf32>
      %94 = arith.subf %47, %84 : vector<256x1xf32>
      %95 = math.exp2 %94 : vector<256x1xf32>
      %96 = arith.mulf %53, %95 : vector<256x1xf32>
      %97 = arith.addf %90, %96 : vector<256x1xf32>
      %98 = vector.broadcast %95 : vector<256x1xf32> to vector<256x128xf32>
      %99 = arith.mulf %54, %98 : vector<256x128xf32>
      %100 = arith.addf %93, %99 : vector<256x128xf32>
      %101 = arith.subf %59, %84 : vector<256x1xf32>
      %102 = math.exp2 %101 : vector<256x1xf32>
      %103 = arith.mulf %65, %102 : vector<256x1xf32>
      %104 = arith.addf %97, %103 : vector<256x1xf32>
      %105 = vector.broadcast %102 : vector<256x1xf32> to vector<256x128xf32>
      %106 = arith.mulf %66, %105 : vector<256x128xf32>
      %107 = arith.addf %100, %106 : vector<256x128xf32>
      %108 = arith.subf %71, %84 : vector<256x1xf32>
      %109 = math.exp2 %108 : vector<256x1xf32>
      %110 = arith.mulf %77, %109 : vector<256x1xf32>
      %111 = arith.addf %104, %110 : vector<256x1xf32>
      %112 = vector.broadcast %109 : vector<256x1xf32> to vector<256x128xf32>
      %113 = arith.mulf %78, %112 : vector<256x128xf32>
      %114 = arith.addf %107, %113 : vector<256x128xf32>
      %115 = arith.mulf %29, %86 : vector<256x128xf32>
      %116 = vector.broadcast %111 : vector<256x1xf32> to vector<256x128xf32>
      %117 = arith.addf %115, %116 : vector<256x128xf32>
      %118 = vector.extract_strided_slice %86 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %119 = vector.broadcast %118 : vector<256x1xf32> to vector<256x128xf32>
      %120 = arith.mulf %30, %119 : vector<256x128xf32>
      %121 = arith.addf %120, %114 : vector<256x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %83 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %117 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %121 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %13 = vector.extract_strided_slice %6 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    scf.if %0 {
      %28 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %29 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %30 = tpu.matmul %13, %28, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %31 = vector.multi_reduction <maximumf>, %30, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %32 = vector.shape_cast %31 : vector<256xf32> to vector<256x1xf32>
      %33 = vector.broadcast %32 : vector<256x1xf32> to vector<256x2048xf32>
      %34 = arith.subf %30, %33 : vector<256x2048xf32>
      %35 = math.exp2 %34 : vector<256x2048xf32>
      %36 = arith.truncf %35 : vector<256x2048xf32> to vector<256x2048xbf16>
      %37 = vector.multi_reduction <add>, %35, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %38 = vector.shape_cast %37 : vector<256xf32> to vector<256x1xf32>
      %39 = tpu.matmul %36, %29, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %40 = vector.extract_strided_slice %8 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %41 = vector.extract_strided_slice %10 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %42 = tpu.matmul %13, %40, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %43 = vector.multi_reduction <maximumf>, %42, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %44 = vector.shape_cast %43 : vector<256xf32> to vector<256x1xf32>
      %45 = vector.broadcast %44 : vector<256x1xf32> to vector<256x2048xf32>
      %46 = arith.subf %42, %45 : vector<256x2048xf32>
      %47 = math.exp2 %46 : vector<256x2048xf32>
      %48 = arith.truncf %47 : vector<256x2048xf32> to vector<256x2048xbf16>
      %49 = vector.multi_reduction <add>, %47, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %50 = vector.shape_cast %49 : vector<256xf32> to vector<256x1xf32>
      %51 = tpu.matmul %48, %41, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %52 = vector.extract_strided_slice %8 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %53 = vector.extract_strided_slice %10 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %54 = tpu.matmul %13, %52, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %55 = vector.multi_reduction <maximumf>, %54, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %56 = vector.shape_cast %55 : vector<256xf32> to vector<256x1xf32>
      %57 = vector.broadcast %56 : vector<256x1xf32> to vector<256x2048xf32>
      %58 = arith.subf %54, %57 : vector<256x2048xf32>
      %59 = math.exp2 %58 : vector<256x2048xf32>
      %60 = arith.truncf %59 : vector<256x2048xf32> to vector<256x2048xbf16>
      %61 = vector.multi_reduction <add>, %59, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %62 = vector.shape_cast %61 : vector<256xf32> to vector<256x1xf32>
      %63 = tpu.matmul %60, %53, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %64 = vector.extract_strided_slice %8 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %65 = vector.extract_strided_slice %10 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %66 = tpu.matmul %13, %64, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %67 = vector.multi_reduction <maximumf>, %66, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %68 = vector.shape_cast %67 : vector<256xf32> to vector<256x1xf32>
      %69 = vector.broadcast %68 : vector<256x1xf32> to vector<256x2048xf32>
      %70 = arith.subf %66, %69 : vector<256x2048xf32>
      %71 = math.exp2 %70 : vector<256x2048xf32>
      %72 = arith.truncf %71 : vector<256x2048xf32> to vector<256x2048xbf16>
      %73 = vector.multi_reduction <add>, %71, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %74 = vector.shape_cast %73 : vector<256xf32> to vector<256x1xf32>
      %75 = tpu.matmul %72, %65, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %76 = arith.maximumf %32, %44 : vector<256x1xf32>
      %77 = arith.maximumf %76, %56 : vector<256x1xf32>
      %78 = arith.maximumf %77, %68 : vector<256x1xf32>
      %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x128xf32>
      %80 = arith.subf %32, %78 : vector<256x1xf32>
      %81 = math.exp2 %80 : vector<256x1xf32>
      %82 = arith.mulf %38, %81 : vector<256x1xf32>
      %83 = arith.addf %82, %cst : vector<256x1xf32>
      %84 = vector.broadcast %81 : vector<256x1xf32> to vector<256x128xf32>
      %85 = arith.mulf %39, %84 : vector<256x128xf32>
      %86 = arith.addf %85, %cst_1 : vector<256x128xf32>
      %87 = arith.subf %44, %78 : vector<256x1xf32>
      %88 = math.exp2 %87 : vector<256x1xf32>
      %89 = arith.mulf %50, %88 : vector<256x1xf32>
      %90 = arith.addf %83, %89 : vector<256x1xf32>
      %91 = vector.broadcast %88 : vector<256x1xf32> to vector<256x128xf32>
      %92 = arith.mulf %51, %91 : vector<256x128xf32>
      %93 = arith.addf %86, %92 : vector<256x128xf32>
      %94 = arith.subf %56, %78 : vector<256x1xf32>
      %95 = math.exp2 %94 : vector<256x1xf32>
      %96 = arith.mulf %62, %95 : vector<256x1xf32>
      %97 = arith.addf %90, %96 : vector<256x1xf32>
      %98 = vector.broadcast %95 : vector<256x1xf32> to vector<256x128xf32>
      %99 = arith.mulf %63, %98 : vector<256x128xf32>
      %100 = arith.addf %93, %99 : vector<256x128xf32>
      %101 = arith.subf %68, %78 : vector<256x1xf32>
      %102 = math.exp2 %101 : vector<256x1xf32>
      %103 = arith.mulf %74, %102 : vector<256x1xf32>
      %104 = arith.addf %97, %103 : vector<256x1xf32>
      %105 = vector.broadcast %102 : vector<256x1xf32> to vector<256x128xf32>
      %106 = arith.mulf %75, %105 : vector<256x128xf32>
      %107 = arith.addf %100, %106 : vector<256x128xf32>
      %108 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
      tpu.vector_store %arg9[%c256, %c0], %79 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c256, %c0], %108 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c256, %c0], %107 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %14 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %14 {
      %28 = vector.load %arg9[%c256, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %29 = vector.load %arg10[%c256, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %30 = vector.load %arg8[%c256, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %31 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %32 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %33 = tpu.matmul %13, %31, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %34 = vector.multi_reduction <maximumf>, %33, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %35 = vector.shape_cast %34 : vector<256xf32> to vector<256x1xf32>
      %36 = vector.broadcast %35 : vector<256x1xf32> to vector<256x2048xf32>
      %37 = arith.subf %33, %36 : vector<256x2048xf32>
      %38 = math.exp2 %37 : vector<256x2048xf32>
      %39 = arith.truncf %38 : vector<256x2048xf32> to vector<256x2048xbf16>
      %40 = vector.multi_reduction <add>, %38, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %41 = vector.shape_cast %40 : vector<256xf32> to vector<256x1xf32>
      %42 = tpu.matmul %39, %32, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %43 = vector.extract_strided_slice %8 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %44 = vector.extract_strided_slice %10 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %45 = tpu.matmul %13, %43, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %46 = vector.multi_reduction <maximumf>, %45, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %47 = vector.shape_cast %46 : vector<256xf32> to vector<256x1xf32>
      %48 = vector.broadcast %47 : vector<256x1xf32> to vector<256x2048xf32>
      %49 = arith.subf %45, %48 : vector<256x2048xf32>
      %50 = math.exp2 %49 : vector<256x2048xf32>
      %51 = arith.truncf %50 : vector<256x2048xf32> to vector<256x2048xbf16>
      %52 = vector.multi_reduction <add>, %50, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %53 = vector.shape_cast %52 : vector<256xf32> to vector<256x1xf32>
      %54 = tpu.matmul %51, %44, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %55 = vector.extract_strided_slice %8 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %56 = vector.extract_strided_slice %10 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %57 = tpu.matmul %13, %55, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %58 = vector.multi_reduction <maximumf>, %57, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %59 = vector.shape_cast %58 : vector<256xf32> to vector<256x1xf32>
      %60 = vector.broadcast %59 : vector<256x1xf32> to vector<256x2048xf32>
      %61 = arith.subf %57, %60 : vector<256x2048xf32>
      %62 = math.exp2 %61 : vector<256x2048xf32>
      %63 = arith.truncf %62 : vector<256x2048xf32> to vector<256x2048xbf16>
      %64 = vector.multi_reduction <add>, %62, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %65 = vector.shape_cast %64 : vector<256xf32> to vector<256x1xf32>
      %66 = tpu.matmul %63, %56, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %67 = vector.extract_strided_slice %8 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %68 = vector.extract_strided_slice %10 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %69 = tpu.matmul %13, %67, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %70 = vector.multi_reduction <maximumf>, %69, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %71 = vector.shape_cast %70 : vector<256xf32> to vector<256x1xf32>
      %72 = vector.broadcast %71 : vector<256x1xf32> to vector<256x2048xf32>
      %73 = arith.subf %69, %72 : vector<256x2048xf32>
      %74 = math.exp2 %73 : vector<256x2048xf32>
      %75 = arith.truncf %74 : vector<256x2048xf32> to vector<256x2048xbf16>
      %76 = vector.multi_reduction <add>, %74, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %77 = vector.shape_cast %76 : vector<256xf32> to vector<256x1xf32>
      %78 = tpu.matmul %75, %68, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %79 = arith.maximumf %35, %47 : vector<256x1xf32>
      %80 = arith.maximumf %79, %59 : vector<256x1xf32>
      %81 = arith.maximumf %80, %71 : vector<256x1xf32>
      %82 = vector.broadcast %81 : vector<256x1xf32> to vector<256x128xf32>
      %83 = arith.maximumf %28, %82 : vector<256x128xf32>
      %84 = vector.extract_strided_slice %83 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %85 = arith.subf %28, %83 : vector<256x128xf32>
      %86 = math.exp2 %85 : vector<256x128xf32>
      %87 = arith.subf %35, %84 : vector<256x1xf32>
      %88 = math.exp2 %87 : vector<256x1xf32>
      %89 = arith.mulf %41, %88 : vector<256x1xf32>
      %90 = arith.addf %89, %cst : vector<256x1xf32>
      %91 = vector.broadcast %88 : vector<256x1xf32> to vector<256x128xf32>
      %92 = arith.mulf %42, %91 : vector<256x128xf32>
      %93 = arith.addf %92, %cst_1 : vector<256x128xf32>
      %94 = arith.subf %47, %84 : vector<256x1xf32>
      %95 = math.exp2 %94 : vector<256x1xf32>
      %96 = arith.mulf %53, %95 : vector<256x1xf32>
      %97 = arith.addf %90, %96 : vector<256x1xf32>
      %98 = vector.broadcast %95 : vector<256x1xf32> to vector<256x128xf32>
      %99 = arith.mulf %54, %98 : vector<256x128xf32>
      %100 = arith.addf %93, %99 : vector<256x128xf32>
      %101 = arith.subf %59, %84 : vector<256x1xf32>
      %102 = math.exp2 %101 : vector<256x1xf32>
      %103 = arith.mulf %65, %102 : vector<256x1xf32>
      %104 = arith.addf %97, %103 : vector<256x1xf32>
      %105 = vector.broadcast %102 : vector<256x1xf32> to vector<256x128xf32>
      %106 = arith.mulf %66, %105 : vector<256x128xf32>
      %107 = arith.addf %100, %106 : vector<256x128xf32>
      %108 = arith.subf %71, %84 : vector<256x1xf32>
      %109 = math.exp2 %108 : vector<256x1xf32>
      %110 = arith.mulf %77, %109 : vector<256x1xf32>
      %111 = arith.addf %104, %110 : vector<256x1xf32>
      %112 = vector.broadcast %109 : vector<256x1xf32> to vector<256x128xf32>
      %113 = arith.mulf %78, %112 : vector<256x128xf32>
      %114 = arith.addf %107, %113 : vector<256x128xf32>
      %115 = arith.mulf %29, %86 : vector<256x128xf32>
      %116 = vector.broadcast %111 : vector<256x1xf32> to vector<256x128xf32>
      %117 = arith.addf %115, %116 : vector<256x128xf32>
      %118 = vector.extract_strided_slice %86 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %119 = vector.broadcast %118 : vector<256x1xf32> to vector<256x128xf32>
      %120 = arith.mulf %30, %119 : vector<256x128xf32>
      %121 = arith.addf %120, %114 : vector<256x128xf32>
      tpu.vector_store %arg9[%c256, %c0], %83 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c256, %c0], %117 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c256, %c0], %121 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %15 = vector.load %arg4[%c0, %c1, %c0, %c0] : memref<1x2x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %16 = vector.shape_cast %15 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %17 = arith.extf %16 : vector<512x128xbf16> to vector<512x128xf32>
    %18 = arith.mulf %17, %cst_0 : vector<512x128xf32>
    %19 = arith.truncf %18 : vector<512x128xf32> to vector<512x128xbf16>
    %20 = vector.load %arg5[%c0, %c1, %c0, %c0] : memref<1x2x8192x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x8192x128xbf16>
    %21 = vector.shape_cast %20 : vector<1x1x8192x128xbf16> to vector<8192x128xbf16>
    %22 = vector.load %arg6[%c0, %c1, %c0, %c0] : memref<1x2x8192x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x8192x128xbf16>
    %23 = vector.shape_cast %22 : vector<1x1x8192x128xbf16> to vector<8192x128xbf16>
    %24 = vector.extract_strided_slice %19 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    scf.if %0 {
      %28 = vector.extract_strided_slice %21 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %29 = vector.extract_strided_slice %23 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %30 = tpu.matmul %24, %28, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %31 = vector.multi_reduction <maximumf>, %30, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %32 = vector.shape_cast %31 : vector<256xf32> to vector<256x1xf32>
      %33 = vector.broadcast %32 : vector<256x1xf32> to vector<256x2048xf32>
      %34 = arith.subf %30, %33 : vector<256x2048xf32>
      %35 = math.exp2 %34 : vector<256x2048xf32>
      %36 = arith.truncf %35 : vector<256x2048xf32> to vector<256x2048xbf16>
      %37 = vector.multi_reduction <add>, %35, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %38 = vector.shape_cast %37 : vector<256xf32> to vector<256x1xf32>
      %39 = tpu.matmul %36, %29, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %40 = vector.extract_strided_slice %21 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %41 = vector.extract_strided_slice %23 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %42 = tpu.matmul %24, %40, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %43 = vector.multi_reduction <maximumf>, %42, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %44 = vector.shape_cast %43 : vector<256xf32> to vector<256x1xf32>
      %45 = vector.broadcast %44 : vector<256x1xf32> to vector<256x2048xf32>
      %46 = arith.subf %42, %45 : vector<256x2048xf32>
      %47 = math.exp2 %46 : vector<256x2048xf32>
      %48 = arith.truncf %47 : vector<256x2048xf32> to vector<256x2048xbf16>
      %49 = vector.multi_reduction <add>, %47, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %50 = vector.shape_cast %49 : vector<256xf32> to vector<256x1xf32>
      %51 = tpu.matmul %48, %41, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %52 = vector.extract_strided_slice %21 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %53 = vector.extract_strided_slice %23 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %54 = tpu.matmul %24, %52, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %55 = vector.multi_reduction <maximumf>, %54, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %56 = vector.shape_cast %55 : vector<256xf32> to vector<256x1xf32>
      %57 = vector.broadcast %56 : vector<256x1xf32> to vector<256x2048xf32>
      %58 = arith.subf %54, %57 : vector<256x2048xf32>
      %59 = math.exp2 %58 : vector<256x2048xf32>
      %60 = arith.truncf %59 : vector<256x2048xf32> to vector<256x2048xbf16>
      %61 = vector.multi_reduction <add>, %59, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %62 = vector.shape_cast %61 : vector<256xf32> to vector<256x1xf32>
      %63 = tpu.matmul %60, %53, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %64 = vector.extract_strided_slice %21 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %65 = vector.extract_strided_slice %23 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %66 = tpu.matmul %24, %64, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %67 = vector.multi_reduction <maximumf>, %66, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %68 = vector.shape_cast %67 : vector<256xf32> to vector<256x1xf32>
      %69 = vector.broadcast %68 : vector<256x1xf32> to vector<256x2048xf32>
      %70 = arith.subf %66, %69 : vector<256x2048xf32>
      %71 = math.exp2 %70 : vector<256x2048xf32>
      %72 = arith.truncf %71 : vector<256x2048xf32> to vector<256x2048xbf16>
      %73 = vector.multi_reduction <add>, %71, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %74 = vector.shape_cast %73 : vector<256xf32> to vector<256x1xf32>
      %75 = tpu.matmul %72, %65, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %76 = arith.maximumf %32, %44 : vector<256x1xf32>
      %77 = arith.maximumf %76, %56 : vector<256x1xf32>
      %78 = arith.maximumf %77, %68 : vector<256x1xf32>
      %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x128xf32>
      %80 = arith.subf %32, %78 : vector<256x1xf32>
      %81 = math.exp2 %80 : vector<256x1xf32>
      %82 = arith.mulf %38, %81 : vector<256x1xf32>
      %83 = arith.addf %82, %cst : vector<256x1xf32>
      %84 = vector.broadcast %81 : vector<256x1xf32> to vector<256x128xf32>
      %85 = arith.mulf %39, %84 : vector<256x128xf32>
      %86 = arith.addf %85, %cst_1 : vector<256x128xf32>
      %87 = arith.subf %44, %78 : vector<256x1xf32>
      %88 = math.exp2 %87 : vector<256x1xf32>
      %89 = arith.mulf %50, %88 : vector<256x1xf32>
      %90 = arith.addf %83, %89 : vector<256x1xf32>
      %91 = vector.broadcast %88 : vector<256x1xf32> to vector<256x128xf32>
      %92 = arith.mulf %51, %91 : vector<256x128xf32>
      %93 = arith.addf %86, %92 : vector<256x128xf32>
      %94 = arith.subf %56, %78 : vector<256x1xf32>
      %95 = math.exp2 %94 : vector<256x1xf32>
      %96 = arith.mulf %62, %95 : vector<256x1xf32>
      %97 = arith.addf %90, %96 : vector<256x1xf32>
      %98 = vector.broadcast %95 : vector<256x1xf32> to vector<256x128xf32>
      %99 = arith.mulf %63, %98 : vector<256x128xf32>
      %100 = arith.addf %93, %99 : vector<256x128xf32>
      %101 = arith.subf %68, %78 : vector<256x1xf32>
      %102 = math.exp2 %101 : vector<256x1xf32>
      %103 = arith.mulf %74, %102 : vector<256x1xf32>
      %104 = arith.addf %97, %103 : vector<256x1xf32>
      %105 = vector.broadcast %102 : vector<256x1xf32> to vector<256x128xf32>
      %106 = arith.mulf %75, %105 : vector<256x128xf32>
      %107 = arith.addf %100, %106 : vector<256x128xf32>
      %108 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
      tpu.vector_store %arg9[%c512, %c0], %79 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c512, %c0], %108 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c512, %c0], %107 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %25 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %25 {
      %28 = vector.load %arg9[%c512, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %29 = vector.load %arg10[%c512, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %30 = vector.load %arg8[%c512, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %31 = vector.extract_strided_slice %21 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %32 = vector.extract_strided_slice %23 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %33 = tpu.matmul %24, %31, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %34 = vector.multi_reduction <maximumf>, %33, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %35 = vector.shape_cast %34 : vector<256xf32> to vector<256x1xf32>
      %36 = vector.broadcast %35 : vector<256x1xf32> to vector<256x2048xf32>
      %37 = arith.subf %33, %36 : vector<256x2048xf32>
      %38 = math.exp2 %37 : vector<256x2048xf32>
      %39 = arith.truncf %38 : vector<256x2048xf32> to vector<256x2048xbf16>
      %40 = vector.multi_reduction <add>, %38, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %41 = vector.shape_cast %40 : vector<256xf32> to vector<256x1xf32>
      %42 = tpu.matmul %39, %32, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %43 = vector.extract_strided_slice %21 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %44 = vector.extract_strided_slice %23 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %45 = tpu.matmul %24, %43, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %46 = vector.multi_reduction <maximumf>, %45, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %47 = vector.shape_cast %46 : vector<256xf32> to vector<256x1xf32>
      %48 = vector.broadcast %47 : vector<256x1xf32> to vector<256x2048xf32>
      %49 = arith.subf %45, %48 : vector<256x2048xf32>
      %50 = math.exp2 %49 : vector<256x2048xf32>
      %51 = arith.truncf %50 : vector<256x2048xf32> to vector<256x2048xbf16>
      %52 = vector.multi_reduction <add>, %50, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %53 = vector.shape_cast %52 : vector<256xf32> to vector<256x1xf32>
      %54 = tpu.matmul %51, %44, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %55 = vector.extract_strided_slice %21 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %56 = vector.extract_strided_slice %23 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %57 = tpu.matmul %24, %55, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %58 = vector.multi_reduction <maximumf>, %57, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %59 = vector.shape_cast %58 : vector<256xf32> to vector<256x1xf32>
      %60 = vector.broadcast %59 : vector<256x1xf32> to vector<256x2048xf32>
      %61 = arith.subf %57, %60 : vector<256x2048xf32>
      %62 = math.exp2 %61 : vector<256x2048xf32>
      %63 = arith.truncf %62 : vector<256x2048xf32> to vector<256x2048xbf16>
      %64 = vector.multi_reduction <add>, %62, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %65 = vector.shape_cast %64 : vector<256xf32> to vector<256x1xf32>
      %66 = tpu.matmul %63, %56, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %67 = vector.extract_strided_slice %21 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %68 = vector.extract_strided_slice %23 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %69 = tpu.matmul %24, %67, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %70 = vector.multi_reduction <maximumf>, %69, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %71 = vector.shape_cast %70 : vector<256xf32> to vector<256x1xf32>
      %72 = vector.broadcast %71 : vector<256x1xf32> to vector<256x2048xf32>
      %73 = arith.subf %69, %72 : vector<256x2048xf32>
      %74 = math.exp2 %73 : vector<256x2048xf32>
      %75 = arith.truncf %74 : vector<256x2048xf32> to vector<256x2048xbf16>
      %76 = vector.multi_reduction <add>, %74, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %77 = vector.shape_cast %76 : vector<256xf32> to vector<256x1xf32>
      %78 = tpu.matmul %75, %68, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %79 = arith.maximumf %35, %47 : vector<256x1xf32>
      %80 = arith.maximumf %79, %59 : vector<256x1xf32>
      %81 = arith.maximumf %80, %71 : vector<256x1xf32>
      %82 = vector.broadcast %81 : vector<256x1xf32> to vector<256x128xf32>
      %83 = arith.maximumf %28, %82 : vector<256x128xf32>
      %84 = vector.extract_strided_slice %83 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %85 = arith.subf %28, %83 : vector<256x128xf32>
      %86 = math.exp2 %85 : vector<256x128xf32>
      %87 = arith.subf %35, %84 : vector<256x1xf32>
      %88 = math.exp2 %87 : vector<256x1xf32>
      %89 = arith.mulf %41, %88 : vector<256x1xf32>
      %90 = arith.addf %89, %cst : vector<256x1xf32>
      %91 = vector.broadcast %88 : vector<256x1xf32> to vector<256x128xf32>
      %92 = arith.mulf %42, %91 : vector<256x128xf32>
      %93 = arith.addf %92, %cst_1 : vector<256x128xf32>
      %94 = arith.subf %47, %84 : vector<256x1xf32>
      %95 = math.exp2 %94 : vector<256x1xf32>
      %96 = arith.mulf %53, %95 : vector<256x1xf32>
      %97 = arith.addf %90, %96 : vector<256x1xf32>
      %98 = vector.broadcast %95 : vector<256x1xf32> to vector<256x128xf32>
      %99 = arith.mulf %54, %98 : vector<256x128xf32>
      %100 = arith.addf %93, %99 : vector<256x128xf32>
      %101 = arith.subf %59, %84 : vector<256x1xf32>
      %102 = math.exp2 %101 : vector<256x1xf32>
      %103 = arith.mulf %65, %102 : vector<256x1xf32>
      %104 = arith.addf %97, %103 : vector<256x1xf32>
      %105 = vector.broadcast %102 : vector<256x1xf32> to vector<256x128xf32>
      %106 = arith.mulf %66, %105 : vector<256x128xf32>
      %107 = arith.addf %100, %106 : vector<256x128xf32>
      %108 = arith.subf %71, %84 : vector<256x1xf32>
      %109 = math.exp2 %108 : vector<256x1xf32>
      %110 = arith.mulf %77, %109 : vector<256x1xf32>
      %111 = arith.addf %104, %110 : vector<256x1xf32>
      %112 = vector.broadcast %109 : vector<256x1xf32> to vector<256x128xf32>
      %113 = arith.mulf %78, %112 : vector<256x128xf32>
      %114 = arith.addf %107, %113 : vector<256x128xf32>
      %115 = arith.mulf %29, %86 : vector<256x128xf32>
      %116 = vector.broadcast %111 : vector<256x1xf32> to vector<256x128xf32>
      %117 = arith.addf %115, %116 : vector<256x128xf32>
      %118 = vector.extract_strided_slice %86 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %119 = vector.broadcast %118 : vector<256x1xf32> to vector<256x128xf32>
      %120 = arith.mulf %30, %119 : vector<256x128xf32>
      %121 = arith.addf %120, %114 : vector<256x128xf32>
      tpu.vector_store %arg9[%c512, %c0], %83 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c512, %c0], %117 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c512, %c0], %121 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %26 = vector.extract_strided_slice %19 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    scf.if %0 {
      %28 = vector.extract_strided_slice %21 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %29 = vector.extract_strided_slice %23 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %30 = tpu.matmul %26, %28, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %31 = vector.multi_reduction <maximumf>, %30, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %32 = vector.shape_cast %31 : vector<256xf32> to vector<256x1xf32>
      %33 = vector.broadcast %32 : vector<256x1xf32> to vector<256x2048xf32>
      %34 = arith.subf %30, %33 : vector<256x2048xf32>
      %35 = math.exp2 %34 : vector<256x2048xf32>
      %36 = arith.truncf %35 : vector<256x2048xf32> to vector<256x2048xbf16>
      %37 = vector.multi_reduction <add>, %35, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %38 = vector.shape_cast %37 : vector<256xf32> to vector<256x1xf32>
      %39 = tpu.matmul %36, %29, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %40 = vector.extract_strided_slice %21 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %41 = vector.extract_strided_slice %23 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %42 = tpu.matmul %26, %40, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %43 = vector.multi_reduction <maximumf>, %42, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %44 = vector.shape_cast %43 : vector<256xf32> to vector<256x1xf32>
      %45 = vector.broadcast %44 : vector<256x1xf32> to vector<256x2048xf32>
      %46 = arith.subf %42, %45 : vector<256x2048xf32>
      %47 = math.exp2 %46 : vector<256x2048xf32>
      %48 = arith.truncf %47 : vector<256x2048xf32> to vector<256x2048xbf16>
      %49 = vector.multi_reduction <add>, %47, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %50 = vector.shape_cast %49 : vector<256xf32> to vector<256x1xf32>
      %51 = tpu.matmul %48, %41, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %52 = vector.extract_strided_slice %21 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %53 = vector.extract_strided_slice %23 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %54 = tpu.matmul %26, %52, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %55 = vector.multi_reduction <maximumf>, %54, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %56 = vector.shape_cast %55 : vector<256xf32> to vector<256x1xf32>
      %57 = vector.broadcast %56 : vector<256x1xf32> to vector<256x2048xf32>
      %58 = arith.subf %54, %57 : vector<256x2048xf32>
      %59 = math.exp2 %58 : vector<256x2048xf32>
      %60 = arith.truncf %59 : vector<256x2048xf32> to vector<256x2048xbf16>
      %61 = vector.multi_reduction <add>, %59, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %62 = vector.shape_cast %61 : vector<256xf32> to vector<256x1xf32>
      %63 = tpu.matmul %60, %53, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %64 = vector.extract_strided_slice %21 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %65 = vector.extract_strided_slice %23 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %66 = tpu.matmul %26, %64, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %67 = vector.multi_reduction <maximumf>, %66, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %68 = vector.shape_cast %67 : vector<256xf32> to vector<256x1xf32>
      %69 = vector.broadcast %68 : vector<256x1xf32> to vector<256x2048xf32>
      %70 = arith.subf %66, %69 : vector<256x2048xf32>
      %71 = math.exp2 %70 : vector<256x2048xf32>
      %72 = arith.truncf %71 : vector<256x2048xf32> to vector<256x2048xbf16>
      %73 = vector.multi_reduction <add>, %71, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %74 = vector.shape_cast %73 : vector<256xf32> to vector<256x1xf32>
      %75 = tpu.matmul %72, %65, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %76 = arith.maximumf %32, %44 : vector<256x1xf32>
      %77 = arith.maximumf %76, %56 : vector<256x1xf32>
      %78 = arith.maximumf %77, %68 : vector<256x1xf32>
      %79 = vector.broadcast %78 : vector<256x1xf32> to vector<256x128xf32>
      %80 = arith.subf %32, %78 : vector<256x1xf32>
      %81 = math.exp2 %80 : vector<256x1xf32>
      %82 = arith.mulf %38, %81 : vector<256x1xf32>
      %83 = arith.addf %82, %cst : vector<256x1xf32>
      %84 = vector.broadcast %81 : vector<256x1xf32> to vector<256x128xf32>
      %85 = arith.mulf %39, %84 : vector<256x128xf32>
      %86 = arith.addf %85, %cst_1 : vector<256x128xf32>
      %87 = arith.subf %44, %78 : vector<256x1xf32>
      %88 = math.exp2 %87 : vector<256x1xf32>
      %89 = arith.mulf %50, %88 : vector<256x1xf32>
      %90 = arith.addf %83, %89 : vector<256x1xf32>
      %91 = vector.broadcast %88 : vector<256x1xf32> to vector<256x128xf32>
      %92 = arith.mulf %51, %91 : vector<256x128xf32>
      %93 = arith.addf %86, %92 : vector<256x128xf32>
      %94 = arith.subf %56, %78 : vector<256x1xf32>
      %95 = math.exp2 %94 : vector<256x1xf32>
      %96 = arith.mulf %62, %95 : vector<256x1xf32>
      %97 = arith.addf %90, %96 : vector<256x1xf32>
      %98 = vector.broadcast %95 : vector<256x1xf32> to vector<256x128xf32>
      %99 = arith.mulf %63, %98 : vector<256x128xf32>
      %100 = arith.addf %93, %99 : vector<256x128xf32>
      %101 = arith.subf %68, %78 : vector<256x1xf32>
      %102 = math.exp2 %101 : vector<256x1xf32>
      %103 = arith.mulf %74, %102 : vector<256x1xf32>
      %104 = arith.addf %97, %103 : vector<256x1xf32>
      %105 = vector.broadcast %102 : vector<256x1xf32> to vector<256x128xf32>
      %106 = arith.mulf %75, %105 : vector<256x128xf32>
      %107 = arith.addf %100, %106 : vector<256x128xf32>
      %108 = vector.broadcast %104 : vector<256x1xf32> to vector<256x128xf32>
      tpu.vector_store %arg9[%c768, %c0], %79 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c768, %c0], %108 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c768, %c0], %107 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %27 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %27 {
      %28 = vector.load %arg9[%c768, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %29 = vector.load %arg10[%c768, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %30 = vector.load %arg8[%c768, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %31 = vector.extract_strided_slice %21 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %32 = vector.extract_strided_slice %23 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %33 = tpu.matmul %26, %31, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %34 = vector.multi_reduction <maximumf>, %33, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %35 = vector.shape_cast %34 : vector<256xf32> to vector<256x1xf32>
      %36 = vector.broadcast %35 : vector<256x1xf32> to vector<256x2048xf32>
      %37 = arith.subf %33, %36 : vector<256x2048xf32>
      %38 = math.exp2 %37 : vector<256x2048xf32>
      %39 = arith.truncf %38 : vector<256x2048xf32> to vector<256x2048xbf16>
      %40 = vector.multi_reduction <add>, %38, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %41 = vector.shape_cast %40 : vector<256xf32> to vector<256x1xf32>
      %42 = tpu.matmul %39, %32, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %43 = vector.extract_strided_slice %21 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %44 = vector.extract_strided_slice %23 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %45 = tpu.matmul %26, %43, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %46 = vector.multi_reduction <maximumf>, %45, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %47 = vector.shape_cast %46 : vector<256xf32> to vector<256x1xf32>
      %48 = vector.broadcast %47 : vector<256x1xf32> to vector<256x2048xf32>
      %49 = arith.subf %45, %48 : vector<256x2048xf32>
      %50 = math.exp2 %49 : vector<256x2048xf32>
      %51 = arith.truncf %50 : vector<256x2048xf32> to vector<256x2048xbf16>
      %52 = vector.multi_reduction <add>, %50, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %53 = vector.shape_cast %52 : vector<256xf32> to vector<256x1xf32>
      %54 = tpu.matmul %51, %44, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %55 = vector.extract_strided_slice %21 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %56 = vector.extract_strided_slice %23 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %57 = tpu.matmul %26, %55, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %58 = vector.multi_reduction <maximumf>, %57, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %59 = vector.shape_cast %58 : vector<256xf32> to vector<256x1xf32>
      %60 = vector.broadcast %59 : vector<256x1xf32> to vector<256x2048xf32>
      %61 = arith.subf %57, %60 : vector<256x2048xf32>
      %62 = math.exp2 %61 : vector<256x2048xf32>
      %63 = arith.truncf %62 : vector<256x2048xf32> to vector<256x2048xbf16>
      %64 = vector.multi_reduction <add>, %62, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %65 = vector.shape_cast %64 : vector<256xf32> to vector<256x1xf32>
      %66 = tpu.matmul %63, %56, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %67 = vector.extract_strided_slice %21 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %68 = vector.extract_strided_slice %23 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<8192x128xbf16> to vector<2048x128xbf16>
      %69 = tpu.matmul %26, %67, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %70 = vector.multi_reduction <maximumf>, %69, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %71 = vector.shape_cast %70 : vector<256xf32> to vector<256x1xf32>
      %72 = vector.broadcast %71 : vector<256x1xf32> to vector<256x2048xf32>
      %73 = arith.subf %69, %72 : vector<256x2048xf32>
      %74 = math.exp2 %73 : vector<256x2048xf32>
      %75 = arith.truncf %74 : vector<256x2048xf32> to vector<256x2048xbf16>
      %76 = vector.multi_reduction <add>, %74, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %77 = vector.shape_cast %76 : vector<256xf32> to vector<256x1xf32>
      %78 = tpu.matmul %75, %68, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %79 = arith.maximumf %35, %47 : vector<256x1xf32>
      %80 = arith.maximumf %79, %59 : vector<256x1xf32>
      %81 = arith.maximumf %80, %71 : vector<256x1xf32>
      %82 = vector.broadcast %81 : vector<256x1xf32> to vector<256x128xf32>
      %83 = arith.maximumf %28, %82 : vector<256x128xf32>
      %84 = vector.extract_strided_slice %83 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %85 = arith.subf %28, %83 : vector<256x128xf32>
      %86 = math.exp2 %85 : vector<256x128xf32>
      %87 = arith.subf %35, %84 : vector<256x1xf32>
      %88 = math.exp2 %87 : vector<256x1xf32>
      %89 = arith.mulf %41, %88 : vector<256x1xf32>
      %90 = arith.addf %89, %cst : vector<256x1xf32>
      %91 = vector.broadcast %88 : vector<256x1xf32> to vector<256x128xf32>
      %92 = arith.mulf %42, %91 : vector<256x128xf32>
      %93 = arith.addf %92, %cst_1 : vector<256x128xf32>
      %94 = arith.subf %47, %84 : vector<256x1xf32>
      %95 = math.exp2 %94 : vector<256x1xf32>
      %96 = arith.mulf %53, %95 : vector<256x1xf32>
      %97 = arith.addf %90, %96 : vector<256x1xf32>
      %98 = vector.broadcast %95 : vector<256x1xf32> to vector<256x128xf32>
      %99 = arith.mulf %54, %98 : vector<256x128xf32>
      %100 = arith.addf %93, %99 : vector<256x128xf32>
      %101 = arith.subf %59, %84 : vector<256x1xf32>
      %102 = math.exp2 %101 : vector<256x1xf32>
      %103 = arith.mulf %65, %102 : vector<256x1xf32>
      %104 = arith.addf %97, %103 : vector<256x1xf32>
      %105 = vector.broadcast %102 : vector<256x1xf32> to vector<256x128xf32>
      %106 = arith.mulf %66, %105 : vector<256x128xf32>
      %107 = arith.addf %100, %106 : vector<256x128xf32>
      %108 = arith.subf %71, %84 : vector<256x1xf32>
      %109 = math.exp2 %108 : vector<256x1xf32>
      %110 = arith.mulf %77, %109 : vector<256x1xf32>
      %111 = arith.addf %104, %110 : vector<256x1xf32>
      %112 = vector.broadcast %109 : vector<256x1xf32> to vector<256x128xf32>
      %113 = arith.mulf %78, %112 : vector<256x128xf32>
      %114 = arith.addf %107, %113 : vector<256x128xf32>
      %115 = arith.mulf %29, %86 : vector<256x128xf32>
      %116 = vector.broadcast %111 : vector<256x1xf32> to vector<256x128xf32>
      %117 = arith.addf %115, %116 : vector<256x128xf32>
      %118 = vector.extract_strided_slice %86 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %119 = vector.broadcast %118 : vector<256x1xf32> to vector<256x128xf32>
      %120 = arith.mulf %30, %119 : vector<256x128xf32>
      %121 = arith.addf %120, %114 : vector<256x128xf32>
      tpu.vector_store %arg9[%c768, %c0], %83 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c768, %c0], %117 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c768, %c0], %121 {strides = array<i32>} : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    scf.if %1 {
      %28 = vector.load %arg10[%c0, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %29 = vector.load %arg8[%c0, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %30 = vector.broadcast %28 : vector<512x1xf32> to vector<512x128xf32>
      %31 = arith.divf %29, %30 : vector<512x128xf32>
      %32 = arith.truncf %31 : vector<512x128xf32> to vector<512x128xbf16>
      %33 = vector.shape_cast %32 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %33 {strides = array<i32>} : memref<1x2x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %34 = vector.load %arg10[%c512, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %35 = vector.load %arg8[%c512, %c0] : memref<1024x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %36 = vector.broadcast %34 : vector<512x1xf32> to vector<512x128xf32>
      %37 = arith.divf %35, %36 : vector<512x128xf32>
      %38 = arith.truncf %37 : vector<512x128xf32> to vector<512x128xbf16>
      %39 = vector.shape_cast %38 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c1, %c0, %c0], %39 {strides = array<i32>} : memref<1x2x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c2_i32 = arith.constant 2 : i32
    %0 = arith.muli %arg1, %c2_i32 : i32
    %1 = arith.divsi %0, %c2_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c2_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c2_i32 = arith.constant 2 : i32
    %0 = arith.muli %arg1, %c2_i32 : i32
    %1 = arith.divsi %0, %c2_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c2_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

